"""E2E camera AV stack: sensor bridge, the three variant models, BC
bootstrap, and closed-loop integration (reference: rift/ego/b2d/
e2e_agent.py + adzoo/{uniad,vad,sparsedrive})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.map import make_grid_town
from rift_tpu.scenario.env import TrafficEnv, env_step


@pytest.fixture(scope="module")
def scene():
    tm = make_grid_town()
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=3,
                     num_walkers=1, num_statics=1)
    state, crit, spec = env.reset()
    return tm, env, state, crit, spec


def test_camera_render_semantics(scene):
    from rift_tpu.ego.sensors import (
        CH_DRIVABLE, CH_INV_DEPTH, CH_VALID, CH_VEHICLE, render_cameras,
    )

    tm, env, state, crit, spec = scene
    imgs = render_cameras(tm, spec, state)
    S = state.alive.shape[0]
    assert imgs.shape[:2] == (S, 6)
    assert bool(jnp.isfinite(imgs).all())
    # ground pixels exist and drivable area is seen somewhere
    assert float(imgs[..., CH_VALID].mean()) > 0.2
    assert float(imgs[..., CH_DRIVABLE].sum()) > 0
    # channels are masked by ground validity
    assert bool((imgs[..., CH_DRIVABLE] <= imgs[..., CH_VALID]).all())
    # inverse depth only where a ground hit exists
    assert bool(((imgs[..., CH_INV_DEPTH] > 0) <= (imgs[..., CH_VALID] > 0)).all())


def test_camera_sees_vehicle_ahead(scene):
    from rift_tpu.ego.sensors import CH_VEHICLE, render_cameras

    tm, env, state, crit, spec = scene
    # plant a vehicle 10 m dead ahead of ego 0 and deaden every other
    # agent: the spawn layout is seed-dependent, and a background vehicle
    # behind the ego legitimately appears in the back camera
    ego_pos, h = state.pos[0, 0], state.heading[0, 0]
    ahead = ego_pos + 10.0 * jnp.asarray([jnp.cos(h), jnp.sin(h)])
    only01 = jnp.zeros_like(state.alive[0]).at[:2].set(True)
    st = state.replace(
        pos=state.pos.at[0, 1].set(ahead),
        heading=state.heading.at[0, 1].set(h),
        alive=state.alive.at[0].set(only01),
        agent_class=state.agent_class.at[0, 1].set(0),
        shape=state.shape.at[0, 1].set(jnp.asarray([2.0, 4.5])),
    )
    imgs = render_cameras(tm, spec, st)
    front = float(imgs[0, 0, ..., CH_VEHICLE].sum())
    back = float(imgs[0, 3, ..., CH_VEHICLE].sum())
    assert front > 0, "vehicle ahead must appear in the front camera"
    assert back == 0, "vehicle ahead must not appear in the back camera"


def test_project_points_roundtrip():
    from rift_tpu.ego.sensors import project_points

    uv, vis = project_points(jnp.asarray([[15.0, 0.0], [-15.0, 0.0],
                                          [0.0, 20.0]]))
    assert bool(vis[0, 0])  # ahead -> front camera
    assert not bool(vis[1, 0])  # behind -> not in front camera
    assert bool(vis[1, 3])  # behind -> back camera
    assert bool(vis.any(-1).all())  # every ground point seen by someone
    assert bool(((uv >= 0) & (uv <= 1))[vis].all())


@pytest.mark.parametrize("variant", ["uniad", "vad", "sparsedrive"])
def test_variant_forward(scene, variant):
    from rift_tpu.models.e2e import E2EModel, PRED_LEN, e2e_inputs

    tm, env, state, crit, spec = scene
    imgs, target, speed = e2e_inputs(spec, state, tm)
    m = E2EModel(variant=variant)
    p = m.init(jax.random.PRNGKey(0), imgs, target, speed)
    out = m.apply(p, imgs, target, speed)
    S = state.alive.shape[0]
    assert out["pred_wp"].shape == (S, PRED_LEN, 2)
    assert bool(jnp.isfinite(out["pred_wp"]).all())
    assert out["det_boxes"].shape[-1] == 5
    assert bool(jnp.isfinite(out["det_boxes"]).all())
    if variant == "vad":
        assert "mode_logits" in out and "pred_wp_soft" in out


def test_det_decode_nms(scene):
    from rift_tpu.models.e2e import E2EModel, e2e_inputs
    from rift_tpu.models.e2e.model import DetectionHead

    tm, env, state, crit, spec = scene
    imgs, target, speed = e2e_inputs(spec, state, tm)
    m = E2EModel(variant="uniad")
    p = m.init(jax.random.PRNGKey(0), imgs, target, speed)
    out = m.apply(p, imgs, target, speed)
    boxes, scores = DetectionHead.decode(
        out["det_boxes"], out["det_scores"], top_k=8
    )
    assert boxes.shape[1:] == (8, 5) and scores.shape[1] == 8
    # scores sorted descending
    assert bool((jnp.diff(scores, axis=1) <= 1e-6).all())


def test_registry_and_closed_loop(scene):
    from rift_tpu.policies import EGO_POLICY_LIST

    tm, env, state, crit, spec = scene
    ego = EGO_POLICY_LIST["vad"](tm)
    wp = ego.act(spec, state)
    assert wp.shape[0] == state.alive.shape[0] and wp.shape[-1] == 2
    assert wp.shape[-2] >= 10  # densified to the tracker grid
    s2, c2 = env_step(tm, spec, state, crit, ego_traj=wp)
    assert bool(jnp.isfinite(s2.pos).all())


def test_bc_train_learns_and_drives(scene):
    from rift_tpu.policies import EGO_POLICY_LIST

    tm, env, state, crit, spec = scene
    ego = EGO_POLICY_LIST["sparsedrive"](tm)
    losses = ego.train_bc(spec, state, crit, ticks=40, epochs=3, batch_size=8)
    assert losses[-1] < losses[0]
    # the cloned ego must actually advance (densified waypoint fix:
    # 4-point trajectories previously read as "stop" in track_step)
    s = state
    for _ in range(20):
        s, _ = env_step(tm, spec, s, crit, ego_traj=ego.act(spec, s))
    moved = float(jnp.linalg.norm(s.pos[:, 0] - state.pos[:, 0], axis=-1).max())
    assert moved > 1.0, moved


def test_save_load_roundtrip(scene, tmp_path):
    from rift_tpu.policies import EGO_POLICY_LIST

    tm, env, state, crit, spec = scene
    ego = EGO_POLICY_LIST["uniad"](tm)
    wp1 = ego.act(spec, state)
    ego.save(str(tmp_path / "uniad.npz"))
    ego2 = EGO_POLICY_LIST["uniad"](tm, {"weights": str(tmp_path / "uniad.npz")})
    wp2 = ego2.act(spec, state)
    np.testing.assert_allclose(np.asarray(wp1), np.asarray(wp2), atol=1e-5)


def test_densify_waypoints_math():
    from rift_tpu.sim.pid import densify_local_waypoints

    wp = jnp.asarray([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [4.0, 0.0]])[None]
    d = densify_local_waypoints(wp, wp_dt=0.5, dt=0.1, num_points=30)
    assert d.shape == (1, 30, 2)
    # knots hit exactly; 2 m/s profile -> x(t) = 2t, extrapolated past 2 s
    np.testing.assert_allclose(float(d[0, 4, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(d[0, 9, 0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(d[0, 29, 0]), 6.0, atol=1e-5)


def test_cli_train_ego_bc_e2e(tmp_path):
    """`--mode train_ego --ego_cfg sparsedrive` BC-bootstraps the E2E ego
    from the PDM expert and saves loadable npz weights."""
    import glob

    from rift_tpu.run import main

    main([
        "--mode", "train_ego", "--ego_cfg", "sparsedrive",
        "--cbv_cfg", "standard", "--num_scenario", "1", "--num_agents", "6",
        "--num_episodes", "1", "--max_ticks", "40", "--town", "straight",
        "--out_dir", str(tmp_path),
    ])
    npz = glob.glob(str(tmp_path / "**" / "sparsedrive_bc.npz"), recursive=True)
    assert npz, "BC weights not saved"
