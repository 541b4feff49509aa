"""Vectorized leaderboard criteria.

Replaces the reference's py_trees Criterion nodes
(rift/scenario/tools/atomic_criteria.py) with boolean kernels over SimState,
keeping the leaderboard event semantics used by the scorer
(rift/scenario/statistics_manager.py:27-44):

  collision vehicle      penalty 0.6 per event
  blocked                speed < 0.1 m/s for > 3 s  -> terminate
                         (route_scenario.py:216 ActorBlockedTest params)
  route deviation        > 30 m from the route      -> terminate
                         (route_scenario.py:223 InRouteTest offroad_max)
  outside route lanes    fraction of route driven off lane, scales RC
  scenario timeout       penalty 0.7
  route completion       percent of route arclength covered

All criteria state lives in a [S]-shaped pytree updated once per tick by
`update_criteria` — the whole behavior tree becomes one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..sim.state import ScenarioSpec, SimState

BLOCKED_SPEED = 0.1  # m/s
BLOCKED_TICKS = 30  # 3 s @ 10 fps
ROUTE_DEVIATION_M = 30.0
COMPLETION_RADIUS = 10.0  # leaderboard: done when near the final waypoint

PENALTY_COLLISION_PEDESTRIAN = 0.5
PENALTY_COLLISION_VEHICLE = 0.6
PENALTY_COLLISION_STATIC = 0.65
PENALTY_RED_LIGHT = 0.7
PENALTY_STOP_SIGN = 0.8
PENALTY_TIMEOUT = 0.7


@struct.dataclass
class CriteriaState:
    # ego events
    collisions_vehicle: jnp.ndarray  # [S] int32 event count
    prev_ego_collision: jnp.ndarray  # [S] bool (for rising-edge dedupe)
    blocked_ticks: jnp.ndarray  # [S] int32 consecutive slow ticks
    blocked: jnp.ndarray  # [S] bool
    route_deviation: jnp.ndarray  # [S] bool
    outside_lane_meters: jnp.ndarray  # [S] float32
    driven_meters: jnp.ndarray  # [S] float32
    timeout: jnp.ndarray  # [S] bool
    route_complete: jnp.ndarray  # [S] bool
    red_light_infractions: jnp.ndarray  # [S] int32 (0 until lights land)
    stop_infractions: jnp.ndarray  # [S] int32
    done: jnp.ndarray  # [S] bool
    done_tick: jnp.ndarray  # [S] int32
    # CBV live accumulators (behavior metrics, scenario_manager.py:189-301)
    cbv_speed_sum: jnp.ndarray  # [S] float32
    cbv_acc_sum: jnp.ndarray  # [S]
    cbv_jerk_sum: jnp.ndarray  # [S]
    cbv_count: jnp.ndarray  # [S] int32 samples
    cbv_offroad_ticks: jnp.ndarray  # [S] int32
    cbv_uncomfortable_ticks: jnp.ndarray  # [S] int32
    cbv_collisions: jnp.ndarray  # [S] int32
    prev_cbv_collision: jnp.ndarray  # [S, A] bool
    prev_cbv_acc: jnp.ndarray  # [S, A] float32 (for jerk)


def init_criteria(num_scenarios: int, num_agents: int) -> CriteriaState:
    """Host-side (numpy) build; callers device_put with the state."""
    import numpy as jnp  # noqa: F811 — numpy aliased to build host-side

    S, A = num_scenarios, num_agents
    z = jnp.zeros(S, jnp.int32)
    f = jnp.zeros(S, jnp.float32)
    b = jnp.zeros(S, bool)
    return CriteriaState(
        collisions_vehicle=z,
        prev_ego_collision=b,
        blocked_ticks=z,
        blocked=b,
        route_deviation=b,
        outside_lane_meters=f,
        driven_meters=f,
        timeout=b,
        route_complete=b,
        red_light_infractions=z,
        stop_infractions=z,
        done=b,
        done_tick=z,
        cbv_speed_sum=f,
        cbv_acc_sum=f,
        cbv_jerk_sum=f,
        cbv_count=z,
        cbv_offroad_ticks=z,
        cbv_uncomfortable_ticks=z,
        cbv_collisions=z,
        prev_cbv_collision=jnp.zeros((S, A), bool),
        prev_cbv_acc=jnp.zeros((S, A), jnp.float32),
    )


def update_criteria(
    crit: CriteriaState,
    state: SimState,
    spec: ScenarioSpec,
    dt: float = 0.1,
) -> CriteriaState:
    ego_speed = state.speed[:, 0]
    ego_pos = state.pos[:, 0]
    ego_collision = state.collision[:, 0]
    running = ~crit.done

    # collision events: rising edge only (CollisionTest dedupes repeated
    # contact with the same actor, atomic_criteria.py:289-423)
    new_collision = ego_collision & ~crit.prev_ego_collision & running
    collisions_vehicle = crit.collisions_vehicle + new_collision.astype(jnp.int32)

    # blocked
    slow = ego_speed < BLOCKED_SPEED
    blocked_ticks = jnp.where(slow & running, crit.blocked_ticks + 1, 0)
    blocked = crit.blocked | (blocked_ticks > BLOCKED_TICKS)

    # route deviation: distance to nearest route waypoint
    route_pts = spec.ego_route[..., :2]
    rw = route_pts.shape[1]
    valid = jnp.arange(rw)[None] < spec.ego_route_len[:, None]
    d2 = jnp.sum((route_pts - ego_pos[:, None]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    dist_to_route = jnp.sqrt(jnp.min(d2, axis=-1))
    route_deviation = crit.route_deviation | (
        (dist_to_route > ROUTE_DEVIATION_M) & running
    )

    # outside-route-lanes accounting: meters driven while off-road
    step_m = ego_speed * dt * running
    driven = crit.driven_meters + step_m
    outside = crit.outside_lane_meters + step_m * state.offroad[:, 0]

    # red-light infraction (RunningRedLightTest: entering a signalised
    # connector while its light is red; detected by the world tick)
    red_light = crit.red_light_infractions + (
        state.ego_red_entry & running
    ).astype(jnp.int32)

    # timeout
    timeout = crit.timeout | ((state.tick >= spec.timeout_ticks) & running)

    # completion: cursor reached the end (1 m spacing -> len-1 meters)
    total = jnp.maximum(spec.ego_route_len.astype(jnp.float32) - 1.0, 1.0)
    route_complete = crit.route_complete | (
        (state.ego_route_cursor >= total - COMPLETION_RADIUS) & running
    )

    done = crit.done | blocked | route_deviation | timeout | route_complete
    done_tick = jnp.where(done & ~crit.done, state.tick, crit.done_tick)

    # ------------------------------------------------------------ CBV stats
    cbv = state.is_cbv & state.alive
    n_cbv = cbv.sum(-1).astype(jnp.int32)
    jerk = jnp.abs(state.accel - crit.prev_cbv_acc) / dt
    cbv_f = cbv.astype(jnp.float32) * running[:, None]
    uncomfortable = (
        (jnp.abs(state.accel) > 4.0) | (jnp.abs(jerk) > 10.0)
    )
    new_cbv_col = state.collision & cbv & ~crit.prev_cbv_collision

    return crit.replace(
        collisions_vehicle=collisions_vehicle,
        prev_ego_collision=ego_collision,
        blocked_ticks=blocked_ticks,
        blocked=blocked,
        route_deviation=route_deviation,
        outside_lane_meters=outside,
        driven_meters=driven,
        timeout=timeout,
        route_complete=route_complete,
        red_light_infractions=red_light,
        done=done,
        done_tick=done_tick,
        cbv_speed_sum=crit.cbv_speed_sum + (state.speed * cbv_f).sum(-1),
        cbv_acc_sum=crit.cbv_acc_sum + (jnp.abs(state.accel) * cbv_f).sum(-1),
        cbv_jerk_sum=crit.cbv_jerk_sum + (jerk * cbv_f).sum(-1),
        cbv_count=crit.cbv_count + (n_cbv * running).astype(jnp.int32),
        # gated on `running` like the speed/acc/jerk sums: frozen scenarios
        # must not keep inflating the event counters vs the gated cbv_count
        cbv_offroad_ticks=crit.cbv_offroad_ticks
        + (state.offroad & cbv & running[:, None]).sum(-1).astype(jnp.int32),
        cbv_uncomfortable_ticks=crit.cbv_uncomfortable_ticks
        + (uncomfortable & cbv & running[:, None]).sum(-1).astype(jnp.int32),
        cbv_collisions=crit.cbv_collisions
        + (new_cbv_col & running[:, None]).sum(-1).astype(jnp.int32),
        prev_cbv_collision=state.collision & cbv,
        prev_cbv_acc=state.accel,
    )


def route_completion_percent(crit: CriteriaState, state: SimState, spec: ScenarioSpec):
    total = jnp.maximum(spec.ego_route_len.astype(jnp.float32) - 1.0, 1.0)
    rc = jnp.clip(state.ego_route_cursor / total, 0.0, 1.0) * 100.0
    return jnp.where(crit.route_complete, 100.0, rc)


def driving_score(crit: CriteriaState, state: SimState, spec: ScenarioSpec):
    """Leaderboard score_composed = route_completion x infraction penalty
    (statistics_manager.py:466-556)."""
    rc = route_completion_percent(crit, state, spec)
    # outside-route-lanes scales RC down by the off-lane fraction
    frac_outside = jnp.where(
        crit.driven_meters > 0,
        crit.outside_lane_meters / jnp.maximum(crit.driven_meters, 1e-6),
        0.0,
    )
    rc_eff = rc * (1.0 - frac_outside)
    penalty = (
        PENALTY_COLLISION_VEHICLE ** crit.collisions_vehicle.astype(jnp.float32)
        * PENALTY_RED_LIGHT ** crit.red_light_infractions.astype(jnp.float32)
        * PENALTY_STOP_SIGN ** crit.stop_infractions.astype(jnp.float32)
        * jnp.where(crit.timeout, PENALTY_TIMEOUT, 1.0)
    )
    return rc_eff * penalty, rc, penalty
