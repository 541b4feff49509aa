"""Walker / static agent classes and collision classification.

Reference semantics: CollisionTest classifies hits by blueprint
(vehicle.* / walker.* / static.*, atomic_criteria.py:289-423) and the
scorer applies class-specific penalties 0.6 / 0.5 / 0.65
(statistics_manager.py:27-44).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.scenario import TrafficEnv, recognize_cbvs
from rift_tpu.scenario.criteria import (
    PENALTY_COLLISION_PEDESTRIAN,
    PENALTY_COLLISION_STATIC,
    driving_score,
    init_criteria,
    update_criteria,
)
from rift_tpu.sim.state import CLASS_STATIC, CLASS_WALKER


def _env(num_walkers=0, num_statics=0, seed=0, num_agents=10):
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(
        tm, num_scenarios=2, num_agents=num_agents, seed=seed,
        num_walkers=num_walkers, num_statics=num_statics,
    )
    return env, env.reset()


def test_spawn_classes_and_shapes():
    env, (state, crit, spec) = _env(num_walkers=2, num_statics=1)
    cls = np.asarray(state.agent_class)
    alive = np.asarray(state.alive)
    assert (cls[:, 0] == 0).all()  # ego is a vehicle
    assert ((cls == CLASS_WALKER) & alive).sum(axis=1).tolist() == [2, 2]
    assert ((cls == CLASS_STATIC) & alive).sum(axis=1).tolist() == [1, 1]
    # walkers have pedestrian footprints
    w = cls == CLASS_WALKER
    assert np.asarray(state.shape)[w].max() < 1.0
    # walkers spawn with walking speed
    assert np.asarray(state.speed)[w].min() > 0.5


def test_walker_moves_static_does_not():
    env, (state, crit, spec) = _env(num_walkers=1, num_statics=1)
    cls = np.asarray(state.agent_class)
    p0 = np.asarray(state.pos).copy()
    anchors = np.asarray(state.goal).copy()
    for _ in range(80):
        state, crit = env.step(state, crit)
    p1 = np.asarray(state.pos)
    moved = np.linalg.norm(p1 - p0, axis=-1)
    w = cls == CLASS_WALKER
    st = cls == CLASS_STATIC
    alive = np.asarray(state.alive)
    if (w & alive).any():
        assert moved[w & alive].max() > 2.0  # walkers walked
        # walkers stay inside the patrol corridor around their anchor
        d_anchor = np.linalg.norm((p1 - anchors), axis=-1)
        assert d_anchor[w & alive].max() < 25.0
    assert moved[st].max() < 1e-4  # statics frozen


def test_walker_patrols_back(monkeypatch):
    """Round 3 (VERDICT r2 item 10): walkers are patrollers, not
    one-crossing-then-halt props — after reaching the far curb and
    dwelling, they cross BACK toward their anchor."""
    env, (state, crit, spec) = _env(num_walkers=1, num_statics=0)
    cls = np.asarray(state.agent_class)
    anchors = np.asarray(state.goal).copy()
    w = (cls == CLASS_WALKER) & np.asarray(state.alive)
    assert w.any()
    d_max = np.zeros(state.alive.shape, np.float32)
    returned = np.zeros(state.alive.shape, bool)
    for _ in range(60):  # 600 ticks > one full WALKER_PERIOD
        for _ in range(10):
            state, crit = env.step(state, crit)
        d = np.linalg.norm(np.asarray(state.pos) - anchors, axis=-1)
        returned |= (d_max > 10.0) & (d < d_max - 5.0)
        d_max = np.maximum(d_max, d)
        if returned[w].all():
            break
    assert d_max[w].max() > 10.0, "walker never crossed"
    assert returned[w].any(), "walker never patrolled back"


def test_walkers_never_promoted_to_cbv():
    env, (state, crit, spec) = _env(num_walkers=3, num_statics=0, num_agents=8)
    # force candidacy conditions: run recognition directly on a state where
    # walkers sit right next to the ego route
    is_cbv, goal, gvalid, _, promote = recognize_cbvs(
        env.tmap, spec, state, max_cbvs=3
    )
    cls = np.asarray(state.agent_class)
    assert not np.asarray(promote)[cls != 0].any()


def test_collision_classification_and_penalties():
    env, (state, crit, spec) = _env(num_walkers=1, num_statics=1)
    S, A = state.alive.shape
    # teleport a walker and a static onto the two egos
    pos = np.asarray(state.pos).copy()
    cls = np.asarray(state.agent_class)
    w_slot = int(np.flatnonzero(cls[0] == CLASS_WALKER)[0])
    s_slot = int(np.flatnonzero(cls[1] == CLASS_STATIC)[0])
    pos[0, w_slot] = pos[0, 0]
    pos[1, s_slot] = pos[1, 0]
    state = state.replace(pos=jnp.asarray(pos))
    state, crit = env.step(state, crit)
    assert int(crit.collisions_pedestrian[0]) == 1
    assert int(crit.collisions_static[1]) == 1
    assert int(crit.collisions_vehicle[0]) == 0
    _, _, penalty = driving_score(crit, state, spec)
    assert np.isclose(float(penalty[0]), PENALTY_COLLISION_PEDESTRIAN)
    assert np.isclose(float(penalty[1]), PENALTY_COLLISION_STATIC)


def test_offroad_ignores_walkers():
    env, (state, crit, spec) = _env(num_walkers=2)
    for _ in range(30):
        state, crit = env.step(state, crit)
    cls = np.asarray(state.agent_class)
    off = np.asarray(state.offroad)
    assert not off[cls == CLASS_WALKER].any()
    assert not off[cls == CLASS_STATIC].any()


def test_walker_velocity_heading_consistent():
    """Walkers TURN AROUND at the curb instead of walking backwards: the
    recorded velocity must align with the heading and with the actual
    displacement on every moving tick (history features and the constant-
    control forecasts consume both), and walker controls are zeroed so
    bicycle_forecast_step propagates them as constant velocity
    (pdm_lite autopilot.py forecast_walkers semantics)."""
    env, (state, crit, spec) = _env(num_walkers=2, num_statics=0)
    cls = np.asarray(state.agent_class)
    w = cls == CLASS_WALKER
    moved_any = False
    for _ in range(80):
        prev_pos = np.asarray(state.pos)
        state, crit = env.step(state, crit)
        pos = np.asarray(state.pos)
        hdg = np.asarray(state.heading)
        spd = np.asarray(state.speed)
        ctrl = np.asarray(state.control)
        disp = pos - prev_pos
        moving = w & np.asarray(state.alive) & (spd > 0.1)
        if moving.any():
            moved_any = True
            d = disp[moving]
            h = hdg[moving]
            align = d[:, 0] * np.cos(h) + d[:, 1] * np.sin(h)
            assert (align > 0).all(), "walker displacement opposes heading"
            vel = np.asarray(state.hist_vel)[:, :, -1][moving]
            assert (vel * d).sum(-1).min() > 0, "recorded velocity opposes motion"
        assert np.abs(ctrl[w & np.asarray(state.alive)]).max() == 0.0
    assert moved_any
