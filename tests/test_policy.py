import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.models.pluto import PlutoModel
from rift_tpu.models.pluto.policy import pluto_cbv_act, select_trajectory
from rift_tpu.scenario import TrafficEnv


def test_select_trajectory():
    B, R, M, T = 2, 2, 3, 80
    prob = jnp.zeros((B, R, M)).at[0, 1, 2].set(5.0)  # strong winner for b=0
    cand = jnp.arange(B * R * M * T * 3, dtype=jnp.float32).reshape(B, R, M, T, 3)
    out = {
        "probability": prob,
        "candidate_trajectories": cand,
        "output_ref_free_trajectory": jnp.full((B, T, 3), -1.0),
    }
    traj, idx, use_rf = select_trajectory(out)
    # b=0: winner has softmax prob ~1 > 0.25 -> candidate (index 1*3+2=5)
    assert int(idx[0]) == 5
    assert not bool(use_rf[0])
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(cand[0, 1, 2]))
    # b=1: uniform probs -> top softmax = 1/6 < 0.25 -> ref-free
    assert bool(use_rf[1])
    np.testing.assert_allclose(np.asarray(traj[1]), -1.0)


def _env_with_cbv():
    tm = make_straight_town(length=400.0, num_lanes=2, pad_lanes_to=16)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, max_cbvs=2, seed=3)
    state, crit, spec = env.reset()
    # warm up so histories are valid and CBVs get recognized
    for _ in range(40):
        state, crit = env.step(state, crit)
    return tm, env, state, crit, spec


def test_pluto_cbv_act_eval_and_closed_loop():
    tm, env, state, crit, spec = _env_with_cbv()
    model = PlutoModel(encoder_depth=1, decoder_depth=1)
    # init from the policy's own feature shapes
    from rift_tpu.models.pluto.policy import pluto_cbv_act as act

    res_shapes = None
    from rift_tpu.models.pluto import build_cbv_features
    from rift_tpu.scenario import cbv_slot_assignment

    slots = cbv_slot_assignment(state.is_cbv, 2)
    feats, _ = build_cbv_features(tm, state, slots, spec)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
    params = model.init(jax.random.PRNGKey(0), flat)

    res = act(model, params, tm, spec, state, max_cbvs=2)
    assert res["traj"].shape[:2] == (2, 8)
    assert res["mask"].shape == (2, 8)
    assert not bool(res["mask"][:, 0].any())  # ego never CBV-controlled
    assert bool(jnp.isfinite(res["traj"]).all())

    # drive a few closed-loop steps with the policy in charge
    for _ in range(5):
        res = act(model, params, tm, spec, state, max_cbvs=2)
        state, crit = env.step(
            state, crit, cbv_traj=res["traj"], cbv_traj_mask=res["mask"]
        )
    assert bool(jnp.isfinite(state.pos).all())


def test_pluto_cbv_act_train_mode_advantage():
    tm, env, state, crit, spec = _env_with_cbv()
    # ensure at least one CBV exists for a meaningful check
    if not bool(state.is_cbv.any()):
        from rift_tpu.scenario import wake_all_bvs

        state = wake_all_bvs(state)
        state = state.replace(
            is_cbv=state.is_cbv.at[:, 2].set(state.alive[:, 2]),
            goal=state.goal.at[:, 2].set(state.pos[:, 2] + 50.0),
            goal_valid=state.goal_valid.at[:, 2].set(state.alive[:, 2]),
        )
    model = PlutoModel(encoder_depth=1, decoder_depth=1)
    from rift_tpu.models.pluto import build_cbv_features
    from rift_tpu.scenario import cbv_slot_assignment

    slots = cbv_slot_assignment(state.is_cbv, 2)
    feats, _ = build_cbv_features(tm, state, slots, spec)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
    params = model.init(jax.random.PRNGKey(0), flat)

    res = pluto_cbv_act(model, params, tm, spec, state, max_cbvs=2, train=True)
    adv = res["advantage"]
    valid = res["adv_valid"]
    assert adv.shape == (2, 2, 4, 12)
    assert bool(jnp.isfinite(adv).all())
    if bool(valid.any()):
        # z-scored within each valid CBV group
        for s in range(2):
            for c in range(2):
                v = np.asarray(valid[s, c])
                if v.any():
                    a = np.asarray(adv[s, c])[v]
                    assert abs(a.mean()) < 0.1
