"""Stop-sign behavior + RunningStopTest criterion.

Reference: rift/scenario/tools/atomic_criteria.py:1806-1962 (stop trigger
volume, speed < 0.1 m/s required before leaving) and PDM-Lite's stop
handling. TPU model: TensorMap.stop_lane marks stop-line lane ends; the
halt latch lives in SimState (sim/stop_signs.py).
"""

import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_grid_town, make_straight_town
from rift_tpu.scenario import TrafficEnv
from rift_tpu.sim.stop_signs import STOP_ZONE, stop_zone_info


def test_grid_town_stop_junctions():
    tm = make_grid_town(blocks=2, stop_ratio=0.34)
    stop = np.asarray(tm.stop_lane)
    assert stop.any(), "no stop lanes generated"
    # stop approaches are unsignalised roads, not connectors
    assert not (stop & np.asarray(tm.is_junction)).any()
    # their successor connectors have no light group
    succ = np.asarray(tm.successors)[stop]
    lg = np.asarray(tm.light_group)
    for row in succ:
        for s in row:
            if s >= 0:
                assert lg[s] == -1


def _straight_stop_env(num_agents=2, seed=0):
    # stop line at the end of segment 1 (x = 200 m)
    tm = make_straight_town(length=400.0, num_lanes=2, stop_segment=1)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=num_agents, seed=seed)
    return env, env.reset()


def test_autopilot_halts_at_stop_line_no_infraction():
    env, (state, crit, spec) = _straight_stop_env()
    min_speed_in_zone = np.inf
    passed_line = False
    for _ in range(500):
        state, crit = env.step(state, crit)
        _, in_zone, _ = stop_zone_info(
            env.tmap, state.lane[:, 0], state.pos[:, 0]
        )
        if bool(in_zone[0]):
            min_speed_in_zone = min(min_speed_in_zone, float(state.speed[0, 0]))
        if float(state.pos[0, 0, 0]) > 210.0:
            passed_line = True
            break
    assert passed_line, "ego never cleared the stop line"
    assert min_speed_in_zone < 0.1, "ego did not halt in the stop zone"
    assert int(crit.stop_infractions[0]) == 0


def test_running_stop_counts_infraction():
    """An ego driven straight through the stop zone (external control,
    never braking) must incur exactly one stop infraction."""
    env, (state, crit, spec) = _straight_stop_env()
    # constant forward trajectory at ~8 m/s (local-frame waypoints)
    T = 30
    wp = jnp.tile(
        jnp.stack([jnp.arange(1, T + 1) * 0.8, jnp.zeros(T)], -1)[None],
        (1, 1, 1),
    )
    for _ in range(400):
        state, crit = env.step(state, crit, ego_traj=wp)
        if float(state.pos[0, 0, 0]) > 220.0:
            break
    assert int(crit.stop_infractions[0]) == 1
    # penalty applied: 0.8 per stop infraction
    from rift_tpu.scenario.criteria import PENALTY_STOP_SIGN, driving_score

    _, _, penalty = driving_score(crit, state, spec)
    assert abs(float(penalty[0]) - PENALTY_STOP_SIGN) < 1e-6


def test_stop_latch_resets_between_zones():
    """The halt latch persists after exit (criterion reads it) and resets on
    the next zone entry."""
    from rift_tpu.sim.stop_signs import update_stop_memory

    zone = jnp.array([[False]])
    stopped = jnp.array([[False]])
    # enter zone, halt
    zone, stopped = update_stop_memory(
        zone, stopped, jnp.array([[True]]), jnp.array([[0.05]])
    )
    assert bool(stopped[0, 0])
    # exit: latch persists
    zone, stopped = update_stop_memory(
        zone, stopped, jnp.array([[False]]), jnp.array([[5.0]])
    )
    assert bool(stopped[0, 0])
    # re-enter at speed: latch resets
    zone, stopped = update_stop_memory(
        zone, stopped, jnp.array([[True]]), jnp.array([[5.0]])
    )
    assert not bool(stopped[0, 0])
