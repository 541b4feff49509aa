"""Canonical (frame-invariant) token mode — models/pluto/features.py.

The reference encodes every lane polygon / neighbor history once per CBV
view (pluto_feature.py:normalize re-frames the whole scene per CBV);
canonical mode encodes each map lane and each world agent ONCE and gathers
tokens per CBV — the CBV-relative pose is injected by the model's existing
Fourier position embedding (model.py:404), so no information is lost.

Contracts tested here:
  * the param tree is IDENTICAL between conventions (npz checkpoints
    interoperate; the branch is chosen by key presence, not by params),
  * the deduplicated shared path and the per-sample gathered path (what
    buffered fit samples replay) produce the SAME model outputs,
  * own-frame history features are invariant under a global rigid motion
    of the world (the deduplication is sound: tokens are CBV-independent),
  * the closed loop and a train_round run end-to-end in canonical mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.map import make_grid_town
from rift_tpu.models.pluto import PlutoModel, build_cbv_features
from rift_tpu.models.pluto.features import (
    canonical_map_features,
    shared_history_features,
)
from rift_tpu.models.pluto.policy import pluto_cbv_act
from rift_tpu.scenario import TrafficEnv, cbv_slot_assignment

S, A, C = 2, 6, 2


@pytest.fixture(scope="module")
def world():
    tmap = make_grid_town(blocks=1, num_lanes=2)
    env = TrafficEnv(tmap, num_scenarios=S, num_agents=A, max_cbvs=C, seed=3)
    state, crit, spec = env.reset()
    for _ in range(4):  # populate history
        state, crit = env.step(state, crit)
    # force CBVs: recognition has a 25-tick warmup this fixture skips
    from rift_tpu.scenario import wake_all_bvs

    state = wake_all_bvs(state)
    state = state.replace(
        is_cbv=state.is_cbv.at[:, 1].set(state.alive[:, 1]),
        goal=state.goal.at[:, 1].set(
            state.pos[:, 1] + jnp.array([60.0, 0.0])
        ),
        goal_valid=state.goal_valid.at[:, 1].set(state.alive[:, 1]),
    )
    return tmap, env, state, crit, spec


def _flatten(feats, shared=None):
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
    if shared is not None:
        flat = dict(flat)
        flat["shared"] = {
            **shared, "scen_idx": jnp.repeat(jnp.arange(S), flat_C(feats))
        }
    return flat


def flat_C(feats):
    return feats["agent"]["valid_mask"].shape[1]


def test_param_tree_identical(world):
    tmap, env, state, crit, spec = world
    slots = cbv_slot_assignment(state.is_cbv, C)
    model = PlutoModel(encoder_depth=2, decoder_depth=2)

    legacy, _ = build_cbv_features(tmap, state, slots, spec)
    canon, _, shared = build_cbv_features(
        tmap, state, slots, spec, canonical=True
    )
    p_legacy = model.init(jax.random.PRNGKey(0), _flatten(legacy))
    p_canon = model.init(jax.random.PRNGKey(0), _flatten(canon, shared))

    flat_l = jax.tree_util.tree_flatten_with_path(p_legacy)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(p_canon)[0]
    keys_l = {jax.tree_util.keystr(k): v.shape for k, v in flat_l}
    keys_c = {jax.tree_util.keystr(k): v.shape for k, v in flat_c}
    assert keys_l == keys_c
    # same names -> same per-module init RNG folds -> same values
    for (k1, v1), (k2, v2) in zip(flat_l, flat_c):
        np.testing.assert_allclose(v1, v2, err_msg=jax.tree_util.keystr(k1))


def test_shared_path_matches_gathered_path(world):
    """The deduplicated (token-gather) forward == the per-sample forward
    that fit replays from the buffer — same params, same outputs."""
    tmap, env, state, crit, spec = world
    slots = cbv_slot_assignment(state.is_cbv, C)
    model = PlutoModel(encoder_depth=2, decoder_depth=2)

    feats, _, shared = build_cbv_features(
        tmap, state, slots, spec, canonical=True, with_sample_feats=True
    )
    params = model.init(jax.random.PRNGKey(1), _flatten(feats, shared))

    out_shared = model.apply(params, _flatten(feats, shared))
    out_sample = model.apply(params, _flatten(feats))

    np.testing.assert_allclose(
        out_shared["probability"], out_sample["probability"],
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        out_shared["trajectory"], out_sample["trajectory"],
        rtol=2e-2, atol=2e-2,
    )


def test_precomputed_map_tokens_match_inline(world):
    """pluto_cbv_act with `map_tok` (the per-episode cache that removes the
    map PointsEncoder from the hot loop) == the inline canonical forward."""
    from rift_tpu.models.pluto.policy import canonical_map_tokens

    tmap, env, state, crit, spec = world
    model = PlutoModel(encoder_depth=2, decoder_depth=2)
    slots = cbv_slot_assignment(state.is_cbv, C)
    feats, _, shared = build_cbv_features(tmap, state, slots, spec,
                                          canonical=True)
    params = model.init(jax.random.PRNGKey(1), _flatten(feats, shared))

    tok = canonical_map_tokens(model, params, tmap)
    assert tok.shape == (tmap.num_lanes, model.dim)

    out_inline = pluto_cbv_act(
        model, params, tmap, spec, state, max_cbvs=C, canonical=True
    )
    out_cached = pluto_cbv_act(
        model, params, tmap, spec, state, max_cbvs=C, canonical=True,
        map_tok=tok,
    )
    np.testing.assert_allclose(
        out_cached["traj"], out_inline["traj"], rtol=2e-2, atol=2e-2
    )
    assert bool((out_cached["mask"] == out_inline["mask"]).all())


def test_history_features_frame_invariant(world):
    """A global rigid motion of the world leaves own-frame history features
    unchanged — the precondition for sharing tokens across CBV views."""
    tmap, env, state, crit, spec = world
    f0 = shared_history_features(state)

    th = 0.7
    R = jnp.array(
        [[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]]
    )
    t = jnp.array([123.0, -45.0])
    rot_p = lambda p: p @ R.T + t
    rot_v = lambda v: v @ R.T
    moved = state.replace(
        pos=rot_p(state.pos),
        heading=state.heading + th,
        hist_pos=rot_p(state.hist_pos),
        hist_heading=state.hist_heading + th,
        hist_vel=rot_v(state.hist_vel),
    )
    f1 = shared_history_features(moved)
    np.testing.assert_allclose(f0, f1, atol=1e-4)


def test_canonical_map_features_shape_and_center_match(world):
    """Canonical per-lane features: center convention matches the per-CBV
    polygon_center (same mid-segment pose), and channels stay finite."""
    tmap, env, state, crit, spec = world
    cm = canonical_map_features(tmap)
    L = tmap.centerline.shape[0]
    P = tmap.centerline.shape[1] - 1
    assert cm["feat"].shape == (L, P, 10)
    assert np.isfinite(np.asarray(cm["feat"])).all()
    # the lane's own centerline relative to its center, rotated to its own
    # frame: the mid point must be at the origin with ~zero orientation
    mid = P // 2
    np.testing.assert_allclose(cm["feat"][:, mid, :2], 0.0, atol=1e-5)
    ori = np.arctan2(cm["feat"][:, mid, 5], cm["feat"][:, mid, 4])
    np.testing.assert_allclose(ori, 0.0, atol=1e-5)


def test_closed_loop_and_train_round_canonical(tmp_path, world):
    """End-to-end: canonical rift_pluto rollout -> buffer -> train_round."""
    tmap, env, state, crit, spec = world
    from rift_tpu.policies import RIFTPlutoPolicy
    from rift_tpu.rl import TrainConfig

    pol = RIFTPlutoPolicy(
        tmap,
        cfg={
            "canonical_tokens": True, "max_cbvs": C,
            "encoder_depth": 2, "decoder_depth": 2,
            "buffer_capacity": 64,
            "train": TrainConfig(epochs=1, batch_size=8),
        },
    )
    assert pol.canonical
    for _ in range(3):
        res = pol.act(spec, state, train=True)
        assert np.isfinite(np.asarray(res["traj"])).all()
        # buffered sample features must carry the per-sample canonical
        # inputs so fit can replay them without the shared blocks
        assert "hist_feat" in res["features"]["agent"]
        assert "canonical_feat" in res["features"]["map"]
        state, crit = env.step(
            state, crit, cbv_traj=res["traj"], cbv_traj_mask=res["mask"]
        )
        from rift_tpu.rollout import tick_extras

        pol.store_chunk(
            jax.tree.map(
                lambda x: x[None], tick_extras(tmap, res, state, crit)
            )
        )
    losses = pol.train_round()
    assert losses and np.isfinite(losses).all()
