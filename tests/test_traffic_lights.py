import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_grid_town
from rift_tpu.scenario import TrafficEnv
from rift_tpu.sim.traffic_lights import (
    AXIS_CYCLE,
    FULL_CYCLE,
    GREEN,
    GREEN_TICKS,
    RED,
    YELLOW,
    ego_red_light_entry,
    group_state,
    red_ahead,
)


def test_group_state_cycle():
    tick = jnp.asarray(0)
    # axis 0 green at phase 0; axis 1 red
    assert int(group_state(jnp.asarray(0), tick)) == GREEN
    assert int(group_state(jnp.asarray(1), tick)) == RED
    # after green period: axis 0 yellow
    assert int(group_state(jnp.asarray(0), jnp.asarray(GREEN_TICKS))) == YELLOW
    # second half: axis 1 green
    assert int(group_state(jnp.asarray(1), jnp.asarray(AXIS_CYCLE))) == GREEN
    assert int(group_state(jnp.asarray(0), jnp.asarray(AXIS_CYCLE))) == RED
    # unsignalised
    assert int(group_state(jnp.asarray(-1), tick)) == GREEN
    # full cycle wraps
    assert int(group_state(jnp.asarray(0), jnp.asarray(FULL_CYCLE))) == GREEN


def test_grid_town_has_light_groups():
    tm = make_grid_town(blocks=2, num_lanes=1)
    lg = np.asarray(tm.light_group)
    isj = np.asarray(tm.is_junction)
    assert (lg[isj] >= 0).all()
    assert (lg[~isj] == -1).all()
    # both axes represented
    assert set(lg[isj] % 2) == {0, 1}


def test_red_ahead_blocks_approach():
    tm = make_grid_town(blocks=1, num_lanes=1)
    lg = np.asarray(tm.light_group)
    succ = np.asarray(tm.successors)
    # find a non-junction lane whose successor is a signalised connector
    cand = None
    for li in range(tm.num_lanes):
        if lg[li] == -1 and succ[li, 0] >= 0 and lg[succ[li, 0]] >= 0:
            cand = li
            break
    assert cand is not None
    group = lg[succ[cand, 0]]
    # pick ticks where that group is red vs green
    red_tick = 0 if group % 2 == 1 else AXIS_CYCLE
    green_tick = 0 if group % 2 == 0 else AXIS_CYCLE

    lane_end = np.asarray(tm.centerline)[cand, -1]
    pos = jnp.asarray(lane_end - 5.0 * 0)[None, None] + 0.0  # at the stop line
    lane = jnp.full((1, 1), cand, jnp.int32)
    stop_red, dist = red_ahead(tm, lane, jnp.asarray(lane_end)[None, None], jnp.asarray([red_tick]))
    stop_green, _ = red_ahead(tm, lane, jnp.asarray(lane_end)[None, None], jnp.asarray([green_tick]))
    assert bool(stop_red[0, 0])
    assert not bool(stop_green[0, 0])


def test_ego_red_entry_detection():
    tm = make_grid_town(blocks=1, num_lanes=1)
    lg = np.asarray(tm.light_group)
    conn = int(np.flatnonzero(lg >= 0)[0])
    group = lg[conn]
    red_tick = 0 if group % 2 == 1 else AXIS_CYCLE
    green_tick = 0 if group % 2 == 0 else AXIS_CYCLE
    prev = jnp.asarray([0], jnp.int32)
    new = jnp.asarray([conn], jnp.int32)
    assert bool(ego_red_light_entry(tm, prev, new, jnp.asarray([red_tick]))[0])
    assert not bool(ego_red_light_entry(tm, prev, new, jnp.asarray([green_tick]))[0])
    # staying on the connector is not an entry
    assert not bool(ego_red_light_entry(tm, new, new, jnp.asarray([red_tick]))[0])


def test_bv_traffic_respects_red_lights():
    tm = make_grid_town(blocks=1, num_lanes=1)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=6, seed=17)
    state, crit, spec = env.reset()
    red_runs = 0
    lg = np.asarray(tm.light_group)
    from rift_tpu.sim.traffic_lights import group_state as gs

    for _ in range(150):
        prev_lane = np.asarray(state.lane)
        state, crit = env.step(state, crit)
        new_lane = np.asarray(state.lane)
        tick = int(state.tick[0]) - 1
        alive = np.asarray(state.alive[0])
        for a in range(6):
            if not alive[a]:
                continue
            if new_lane[0, a] != prev_lane[0, a] and lg[new_lane[0, a]] >= 0:
                st = int(gs(jnp.asarray(lg[new_lane[0, a]]), jnp.asarray(tick)))
                if st == RED:
                    red_runs += 1
    # autopilot traffic may occasionally be caught mid-junction by a flip,
    # but wholesale red-running means the stop logic is broken
    assert red_runs <= 2, f"{red_runs} red-light violations by autopilot traffic"
