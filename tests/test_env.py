import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_grid_town, make_straight_town
from rift_tpu.scenario import (
    TrafficEnv,
    cbv_slot_assignment,
    driving_score,
    recognize_cbvs,
    route_completion_percent,
)


def test_env_reset_shapes():
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=1)
    state, crit, spec = env.reset()
    assert state.pos.shape == (2, 8, 2)
    assert bool(state.alive[:, 0].all())  # egos alive
    assert int(state.alive.sum()) > 2  # background spawned
    # ego starts at its route start
    np.testing.assert_allclose(
        np.asarray(state.pos[:, 0]), np.asarray(spec.ego_route[:, 0, :2]), atol=1e-4
    )
    # agents don't overlap at spawn
    for s in range(2):
        alive = np.asarray(state.alive[s])
        p = np.asarray(state.pos[s])[alive]
        d = np.linalg.norm(p[None] - p[:, None], axis=-1)
        np.fill_diagonal(d, 99)
        assert d.min() > 5.0


def test_env_episode_runs_ego_progresses():
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=2)
    state, crit, spec = env.reset()
    for _ in range(150):
        state, crit = env.step(state, crit)
    rc = route_completion_percent(crit, state, spec)
    assert float(rc.min()) > 5.0  # egos made progress
    assert bool(jnp.isfinite(state.pos).all())
    # no ego off-road on a straight road
    assert not bool(state.offroad[:, 0].any())


def test_env_recognition_promotes_cbvs():
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=12, max_cbvs=2, seed=3)
    state, crit, spec = env.reset()
    n_cbv_seen = 0
    for _ in range(100):
        state, crit = env.step(state, crit)
        n_cbv_seen = max(n_cbv_seen, int(state.is_cbv.sum()))
    assert n_cbv_seen >= 1, "no CBV ever recognized"
    assert int(state.is_cbv.sum(-1).max()) <= 2  # cap respected
    # CBVs have valid goals
    if bool(state.is_cbv.any()):
        assert bool((state.goal_valid | ~state.is_cbv).all())


def test_cbv_slot_assignment():
    is_cbv = jnp.array(
        [[False, True, False, True], [False, False, False, False]]
    )
    slots = cbv_slot_assignment(is_cbv, 3)
    assert slots.shape == (2, 3)
    assert set(np.asarray(slots[0]).tolist()) >= {1, 3}
    assert (np.asarray(slots[1]) == -1).all()


def test_driving_score_clean_run():
    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=5)
    state, crit, spec = env.reset()
    for _ in range(60):
        state, crit = env.step(state, crit)
    ds, rc, penalty = driving_score(crit, state, spec)
    assert float(penalty[0]) == 1.0  # no infractions
    assert 0.0 < float(ds[0]) <= 100.0


def test_env_done_freezes_scenario():
    tm = make_straight_town(length=300.0, num_lanes=1)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=2, seed=6)
    state, crit, spec = env.reset()
    # force done
    crit = crit.replace(done=jnp.ones(1, bool))
    p0 = np.asarray(state.pos).copy()
    for _ in range(12):
        state, crit = env.step(state, crit)
    # frozen scenario: agents brake to a stop (small residual motion allowed)
    assert float(state.speed.max()) < 2.0


def test_env_grid_town_episode():
    tm = make_grid_town(blocks=2, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=10, seed=7)
    state, crit, spec = env.reset()
    for _ in range(100):
        state, crit = env.step(state, crit)
    assert bool(jnp.isfinite(state.pos).all())
    rc = route_completion_percent(crit, state, spec)
    assert float(rc.max()) > 2.0


def test_lazy_bv_activation():
    """BVs beyond BV_ACTIVATE_RADIUS spawn pooled (inactive) and wake as
    the ego approaches (route_scenario.py:157-186 lazy physics)."""
    import jax.numpy as jnp

    from rift_tpu.scenario.env import BV_ACTIVATE_RADIUS, TrafficEnv, env_step

    tm = make_straight_town(length=600.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=12, seed=7)
    state, crit, spec = env.reset()
    pooled0 = int(state.bv_pool.sum())
    assert pooled0 > 0, "600 m route should leave distant BVs pooled"
    # pooled agents are inactive and beyond the radius
    d = np.linalg.norm(
        np.asarray(state.pos[0]) - np.asarray(state.pos[0, 0]), axis=-1
    )
    pool_np = np.asarray(state.bv_pool[0])
    assert not bool((np.asarray(state.alive[0]) & pool_np).any())
    assert (d[pool_np] > BV_ACTIVATE_RADIUS).all()

    # teleport the ego next to a pooled BV -> it wakes on the next step
    tgt = int(np.flatnonzero(pool_np)[0])
    state2 = state.replace(
        pos=state.pos.at[0, 0].set(state.pos[0, tgt] + 20.0)
    )
    state3, _ = env_step(tm, spec, state2, crit)
    assert bool(state3.alive[0, tgt])
    assert not bool(state3.bv_pool[0, tgt])
    # a woken agent stays awake even if the ego leaves
    state4 = state3.replace(pos=state3.pos.at[0, 0].set(spec.ego_route[0, 0, :2]))
    state5, _ = env_step(tm, spec, state4, crit)
    assert bool(state5.alive[0, tgt])
