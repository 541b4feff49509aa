"""Traffic-light state machine and stop behavior.

Replaces the reference's CARLA traffic-light plumbing: light registration +
state control in CarlaDataProvider (carla_data_provider.py:401-565), the
PDM-Lite red-light handling (autopilot.py:1053-1205) and the
RunningRedLightTest criterion (atomic_criteria.py:1627-1806).

Model: each junction approach (TensorMap.light_group) alternates
green/yellow/red with the opposing axis; phase is a pure function of the
tick, so every scenario in the batch shares one vectorized evaluation and
rollouts stay deterministic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..map.tensor_map import TensorMap

GREEN, YELLOW, RED = 0, 1, 2
GREEN_TICKS = 100  # 10 s @ 10 fps
YELLOW_TICKS = 20  # 2 s
AXIS_CYCLE = GREEN_TICKS + YELLOW_TICKS  # one axis holds right-of-way
FULL_CYCLE = 2 * AXIS_CYCLE
STOP_DISTANCE = 15.0  # start braking for a red this far from the stop line


def group_state(group: jnp.ndarray, tick: jnp.ndarray) -> jnp.ndarray:
    """Light state for light-group ids (any shape) at `tick` (broadcast).

    Axis 0 (group even) holds green during the first half cycle.
    """
    phase = tick % FULL_CYCLE
    axis = group % 2
    local = jnp.where(axis == 0, phase, (phase + AXIS_CYCLE) % FULL_CYCLE)
    state = jnp.where(
        local < GREEN_TICKS,
        GREEN,
        jnp.where(local < AXIS_CYCLE, YELLOW, RED),
    )
    return jnp.where(group < 0, GREEN, state)


def lane_light_state(tmap: TensorMap, tick: jnp.ndarray) -> jnp.ndarray:
    """[..., L] light state of every lane at tick [...] (GREEN if unsignalised)."""
    return group_state(tmap.light_group, tick[..., None])


def red_ahead(
    tmap: TensorMap,
    lane: jnp.ndarray,  # [S, A] current lane per agent
    pos: jnp.ndarray,  # [S, A, 2]
    tick: jnp.ndarray,  # [S]
):
    """(must_stop [S, A], dist_to_stop_line [S, A]).

    An agent must stop if its current lane's successor connector shows
    red/yellow and the lane end (the stop line) is within STOP_DISTANCE.
    Agents already inside a signalised connector are never told to stop
    (clearing the junction, like CARLA's behavior).
    """
    succ = tmap.successors[lane]  # [S, A, K]
    succ_group = jnp.where(succ >= 0, tmap.light_group[jnp.maximum(succ, 0)], -1)
    succ_state = group_state(succ_group, tick[:, None, None])
    blocked = (succ_group >= 0) & (succ_state != GREEN)
    # all signalised successors blocked -> the agent cannot legally enter
    any_signalised = (succ_group >= 0).any(-1)
    all_blocked = jnp.where(any_signalised, (blocked | (succ_group < 0)).all(-1), False)

    lane_end = tmap.centerline[lane, -1]  # [S, A, 2]
    dist = jnp.linalg.norm(lane_end - pos, axis=-1)
    on_connector = tmap.light_group[lane] >= 0
    must_stop = all_blocked & (dist < STOP_DISTANCE) & ~on_connector
    return must_stop, dist


def ego_red_light_entry(
    tmap: TensorMap,
    prev_lane: jnp.ndarray,  # [S] ego lane before the step
    new_lane: jnp.ndarray,  # [S] ego lane after the step
    tick: jnp.ndarray,  # [S]
) -> jnp.ndarray:
    """[S] bool: the ego just entered a signalised connector on red
    (RunningRedLightTest event)."""
    entered = (new_lane != prev_lane) & (tmap.light_group[new_lane] >= 0)
    state = group_state(tmap.light_group[new_lane], tick)
    return entered & (state == RED)
