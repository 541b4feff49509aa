"""Round-2 wiring: fused CLI path, honest partial batches, recognition
selection, and the full criteria surface in shipped runs (VERDICT r1
next-round items 3-5).

Reference semantics covered:
  * scenario_data_loader.py:109-140 — the final batch is sized honestly;
    padded duplicates must not become statistics records.
  * env_wrapper.py:127-197 — one fused device program per K ticks replaces
    the per-tick host round-trip; same trajectory as the host loop.
  * rift/cbv/recognition/__init__.py:12 — the recognition method is
    selectable (rule | attention) from the CLI.
  * atomic_criteria.py:1806 + statistics_manager.py:27-44 — stop lines and
    walkers/statics exist in shipped route maps so the 0.5/0.65/0.8
    penalty classes can fire.
"""

import numpy as np
import pytest

ROUTES_XML = (
    "/root/reference/rift/scenario/route/drivetransformer_bench2drive_dev10.xml"
)


def test_partial_batch_exact_route_counts(tmp_path):
    """3 routes at num_scenario=2: the padded duplicate in the final batch
    must not register — exactly 3 records, with distinct route ids."""
    from rift_tpu.run import main

    g = main(
        [
            "--mode", "eval", "--ego_cfg", "pdm_lite", "--cbv_cfg", "standard",
            "--num_scenario", "2", "--num_agents", "6", "--num_episodes", "2",
            "--max_ticks", "30", "--routes", ROUTES_XML,
            "--routes_subset", "3514,3255,26405",
            "--num_walkers", "0", "--num_statics", "0",
            "--out_dir", str(tmp_path),
        ]
    )
    assert g.total_routes == 3
    import json
    import os

    res = json.load(
        open(
            os.path.join(
                tmp_path, "eval", "pdm_lite-standard-seed0",
                "simulation_results.json",
            )
        )
    )
    ids = [r["route_id"] for r in res["records"]]
    assert len(ids) == 3 and len(set(ids)) == 3


def test_fused_chunk_matches_host_loop():
    """rollout_chunk with the in-scan pdm ego reproduces the host per-tick
    loop's trajectory (same env_step semantics, just scanned)."""
    import jax

    from rift_tpu.ego.pdm_ego import pdm_ego_waypoints
    from rift_tpu.map import make_straight_town
    from rift_tpu.rollout import rollout_chunk
    from rift_tpu.scenario import TrafficEnv

    tmap = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tmap, num_scenarios=2, num_agents=6, seed=5)
    state, crit, spec = env.reset()

    K = 10
    s_host, c_host = state, crit
    for _ in range(K):
        wp = pdm_ego_waypoints(spec, s_host, tmap)
        s_host, c_host = env.step(s_host, c_host, ego_traj=wp)

    s_fused, c_fused, _ = rollout_chunk(
        None, None, tmap, spec, state, crit,
        num_steps=K, with_policy=False, ego="pdm",
    )
    np.testing.assert_allclose(
        np.asarray(s_fused.pos), np.asarray(s_host.pos), atol=1e-4
    )
    assert bool((c_fused.done == c_host.done).all())


def test_cli_attention_recognition_runs(tmp_path):
    """--cbv_recog attention is reachable end-to-end (random-init scorer)."""
    from rift_tpu.run import main

    with pytest.warns(UserWarning, match="recog_weights"):
        g = main(
            [
                "--mode", "eval", "--ego_cfg", "pdm_lite", "--cbv_cfg",
                "standard", "--num_scenario", "1", "--num_agents", "6",
                "--num_episodes", "1", "--max_ticks", "30",
                "--town", "straight", "--cbv_recog", "attention",
                "--num_walkers", "0", "--num_statics", "0",
                "--out_dir", str(tmp_path),
            ]
        )
    assert g.total_routes == 1


def test_attention_recog_differs_from_rule():
    """With a scorer preferring FAR candidates, attention recognition picks
    different CBVs than the rule's closest-first ranking."""
    import jax.numpy as jnp

    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.scenario.recognition import (
        attn_recognize_cbvs,
        recognize_cbvs,
    )

    tmap = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tmap, num_scenarios=1, num_agents=10, seed=7)
    state, crit, spec = env.reset()
    # advance past warmup so candidates exist
    for _ in range(30):
        state, crit = env.step(state, crit)
    base = state.replace(is_cbv=jnp.zeros_like(state.is_cbv))

    rule_cbv, *_ = recognize_cbvs(tmap, spec, base, max_cbvs=1)
    # scorer: prefer the FARTHEST candidate from the ego
    far_scores = lambda s: jnp.linalg.norm(
        s.pos - s.pos[:, 0:1], axis=-1
    )
    attn_cbv, *_ = attn_recognize_cbvs(
        tmap, spec, base, far_scores, max_cbvs=1
    )
    n_cand = int(
        (rule_cbv | attn_cbv).sum()
    )
    if n_cand >= 2 and int(rule_cbv.sum()) == 1 and int(attn_cbv.sum()) == 1:
        assert not bool((rule_cbv == attn_cbv).all())


def test_from_route_stop_lanes():
    """stop_ratio converts route-map junctions to all-way stop: stop lines
    on every approach, no light phase on the connectors."""
    from rift_tpu.map.from_route import map_from_routes

    a = np.stack([np.linspace(0, 200, 21), np.zeros(21)], -1)
    b = np.stack([np.full(20, 200.0), np.linspace(10, 200, 20)], -1)
    route = np.concatenate([a, b])

    tmap, paths = map_from_routes([route], num_lanes=2, stop_ratio=1.0)
    stop = np.asarray(tmap.stop_lane)
    assert stop.any(), "no stop lanes placed"
    # junction connectors unsignalised at an all-way stop
    junc = np.asarray(tmap.is_junction)
    lg = np.asarray(tmap.light_group)
    assert (lg[junc] < 0).all()
    # the route's own approach lane carries a stop line
    assert stop[paths[0]].any()

    # ratio 0 leaves the junction signalised (unchanged default)
    tmap2, _ = map_from_routes([route], num_lanes=2, stop_ratio=0.0)
    assert not np.asarray(tmap2.stop_lane).any()
    assert (np.asarray(tmap2.light_group) >= 0).any()


def test_teacher_label_pose_aware_differs_from_speed_only():
    """The pose+speed teacher (sft_trainer.py:182-215) must pick the
    candidate on the teacher's ROAD, even when the model's best reference
    line has a mode with the exact teacher speed (VERDICT r1 item 8)."""
    import jax.numpy as jnp

    from rift_tpu.policies import _teacher_label

    R, M, T = 2, 2, 40
    dt = 0.1
    # model prefers reference line 0
    prob = jnp.array([[[5.0, 4.0], [0.0, -1.0]]])  # [1, R, M]
    r_pad = jnp.zeros((1, R), bool)
    # r0 candidates head +x, r1 candidates head +y; modes at 5 and 8 m/s
    dirs = jnp.array([[1.0, 0.0], [0.0, 1.0]])  # [R, 2]
    speeds = jnp.array([5.0, 8.0])  # [M]
    steps = jnp.arange(1, T + 1, dtype=jnp.float32) * dt  # [T]
    pos = (
        dirs[:, None, None, :]
        * (speeds[None, :, None] * steps[None, None, :])[..., None]
    )  # [R, M, T, 2]
    traj = jnp.zeros((1, R, M, T, 6)).at[..., :2].set(pos[None])

    teacher_speed = jnp.array([5.0])
    # teacher pose: 4 s at 5 m/s along +y == r1/m0's horizon waypoint
    teacher_pos = jnp.array([[0.0, 20.0]])

    speed_only = _teacher_label(prob, r_pad, traj, teacher_speed)
    pose_aware = _teacher_label(
        prob, r_pad, traj, teacher_speed, teacher_pos
    )
    assert int(speed_only[0]) == 0  # best ref line r0, speed-closest mode
    assert int(pose_aware[0]) == 1 * M + 0  # the teacher's road wins
    assert int(speed_only[0]) != int(pose_aware[0])


def test_bc_pretrain_policy_and_params_roundtrip(tmp_path):
    """bc_pluto (the bootstrap-pretrain equivalent of pluto_1M_aux_cil)
    trains the FULL model toward the privileged teacher trajectory, and its
    params round-trip through the canonical npz that load_pretrain reads."""
    import jax
    import jax.numpy as jnp

    from rift_tpu.map import make_straight_town
    from rift_tpu.policies import CBV_POLICY_LIST
    from rift_tpu.rl import TrainConfig
    from rift_tpu.rollout import flush_pending, tick_extras
    from rift_tpu.scenario import TrafficEnv

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, max_cbvs=2, seed=7)
    cfg = {"max_cbvs": 2, "encoder_depth": 2, "decoder_depth": 2,
           "buffer_capacity": 64,
           "train": TrainConfig(epochs=1, warmup_epochs=1, batch_size=8,
                                trainable_prefixes=())}
    pol = CBV_POLICY_LIST["bc_pluto"](tm, cfg)
    assert pol.train_cfg.trainable_prefixes == ()
    state, crit, spec = env.reset()
    from rift_tpu.scenario import wake_all_bvs

    state = wake_all_bvs(state)
    state = state.replace(
        is_cbv=state.is_cbv.at[:, 1].set(state.alive[:, 1]),
        goal=state.goal.at[:, 1].set(state.pos[:, 1] + jnp.array([80.0, 0.0])),
        goal_valid=state.goal_valid.at[:, 1].set(state.alive[:, 1]),
    )
    pending = []
    for _ in range(4):
        res = pol.act(spec, state, train=True)
        assert "teacher_traj" in res
        state, crit = env.step(
            state, crit, cbv_traj=res["traj"], cbv_traj_mask=res["mask"]
        )
        pending.append(tick_extras(tm, res, state, crit))
    flush_pending(pol.store_chunk, pending)
    assert "teacher_traj" in pol.buffer.data

    # gradient flows into the ENCODER (full-model pretrain), not just pi_head
    from rift_tpu.rl.buffer import gather_batch

    batch = gather_batch(pol.buffer, jnp.arange(4))
    g = jax.grad(
        lambda p: pol._loss_fn(p, batch, jax.random.PRNGKey(0))
    )(pol.params)
    enc = g["params"]["enc0"]
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(enc))

    # pretrain npz round-trip into a DIFFERENT family member
    path = str(tmp_path / "pretrain.npz")
    pol.save_pretrain(path)
    tgt = CBV_POLICY_LIST["rift_pluto"](tm, cfg)
    tgt.maybe_init(spec, state)
    before = jax.tree.leaves(tgt.params)[0]
    tgt.load_pretrain(path)
    a, b = jax.tree.flatten(tgt.params)[0], jax.tree.flatten(pol.params)[0]
    assert all(np.allclose(x, y, atol=1e-6) for x, y in zip(a, b))
    assert tgt.ref_params is not None  # GRPO KL anchored to the pretrain


def test_expert_overtakes_where_pdm_lite_follows():
    """'expert' must differ behaviorally from 'pdm_lite' (VERDICT r1 weak
    #5): with a stopped vehicle blocking the ego's lane and the adjacent
    lane clear, pdm_lite brakes and queues behind (IDM), while expert's
    privileged lane change overtakes and ends up past the blocker."""
    import jax.numpy as jnp

    from rift_tpu.ego.pdm_ego import pdm_ego_waypoints
    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.sim.world import CLASS_STATIC

    tm = make_straight_town(length=400.0, num_lanes=2)
    finals = {}
    for lane_change in (False, True):
        env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=1)
        state, crit, spec = env.reset()
        # kill the extra traffic; park an immovable blocker 25 m ahead of
        # the ego in its own lane
        ego_pos = state.pos[:, 0]
        ego_hd = state.heading[:, 0]
        blocker = ego_pos + 25.0 * jnp.stack(
            [jnp.cos(ego_hd), jnp.sin(ego_hd)], -1
        )
        state = state.replace(
            alive=state.alive.at[:, 2:].set(False).at[:, 1].set(True),
            pos=state.pos.at[:, 1].set(blocker),
            heading=state.heading.at[:, 1].set(ego_hd),
            speed=state.speed.at[:, 1].set(0.0),
            agent_class=state.agent_class.at[:, 1].set(CLASS_STATIC),
        )
        for _ in range(120):
            wp = pdm_ego_waypoints(spec, state, tm, lane_change=lane_change)
            state, crit = env.step(state, crit, ego_traj=wp)
        finals[lane_change] = (
            float(state.pos[0, 0, 0]),
            float(state.pos[0, 1, 0]),
            bool(state.collision[0, 0]),
        )
    pdm_x, blocker_x, pdm_crash = finals[False]
    exp_x, _, exp_crash = finals[True]
    assert not pdm_crash and not exp_crash
    assert pdm_x < blocker_x, "pdm_lite should queue behind the blocker"
    assert exp_x > blocker_x + 5.0, "expert should overtake the blocker"


def test_fused_attention_custom_vjp(monkeypatch):
    """The TPU attention kernel must be differentiable (full-model BC
    pretrain trains through it): the custom-VJP wrapper's backward is the
    XLA formulation's gradient. The Pallas forward itself is parity-tested
    elsewhere; here the fwd is stubbed to the XLA path so the custom_vjp
    rules run on CPU."""
    import jax
    import jax.numpy as jnp

    import rift_tpu.ops.attention as A

    monkeypatch.setattr(A, "fused_attention_pallas",
                        lambda q, k, v, b, p, h: A.fused_attention_xla(
                            q, k, v, b, p, h))
    B, T, D, H = 4, 6, 32, 2
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, T, D))
               for i in range(3))
    bias = jnp.zeros((H, T, T))
    kpad = jnp.zeros((B, T))
    g = jax.grad(
        lambda q: A._fused_attention_tpu(q, k, v, bias, kpad, H).sum()
    )(q)
    gx = jax.grad(
        lambda q: A.fused_attention_xla(q, k, v, bias, kpad, H).sum()
    )(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gx), atol=1e-5)


def test_cli_eval_defaults_enable_walkers_and_statics(tmp_path, monkeypatch):
    """Shipped eval runs exercise the ped/static collision classes by
    default (VERDICT r1 missing #3)."""
    import rift_tpu.run as run_mod

    captured = {}
    orig = run_mod.TrafficEnv

    class Spy(orig):
        def __init__(self, *a, **kw):
            captured.update(kw)
            super().__init__(*a, **kw)

    monkeypatch.setattr(run_mod, "TrafficEnv", Spy)
    run_mod.main(
        [
            "--mode", "eval", "--ego_cfg", "pdm_lite", "--cbv_cfg",
            "standard", "--num_scenario", "1", "--num_agents", "8",
            "--num_episodes", "1", "--max_ticks", "20",
            "--town", "straight", "--out_dir", str(tmp_path),
        ]
    )
    assert captured["num_walkers"] == 2
    assert captured["num_statics"] == 2


def test_outside_route_lanes_counts_wrong_direction():
    """ORR must accumulate while driving against the lane direction even on
    drivable surface (OutsideRouteLanesTest wrong-lane term,
    atomic_criteria.py:992-1176) — not only while off-road."""
    import jax.numpy as jnp

    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=2, seed=0)
    state, crit, spec = env.reset()
    # point the ego against its lane and hold a constant wrong-way control
    state = state.replace(
        heading=state.heading.at[:, 0].add(jnp.pi),
        speed=state.speed.at[:, 0].set(5.0),
    )
    for _ in range(10):
        state, crit = env.step(
            state, crit, ego_ctrl=jnp.array([[0.6, 0.0, 0.0]])
        )
    assert float(crit.outside_lane_meters[0]) > 2.0, (
        "wrong-direction driving on-road must count as outside-route-lanes"
    )
