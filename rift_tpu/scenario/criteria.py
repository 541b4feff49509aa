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

import jax
import jax.numpy as jnp
import numpy as np
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

# behavior-distribution bin edges (statistics_manager.py CBV_DATA_BINS /
# EGO_DATA_BINS / EGO_SPEED_BINS verbatim — published metric definitions)
CBV_SPEED_EDGES = np.array(
    [0.0, 0.5, 1, 1.5, 2, 2.5, 3, 4, 6, 8, 10, 12, 14], np.float32
)
CBV_DELTA_SPEED_EDGES = np.array(
    [-2.5, -2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4.5,
     5.0, 6.5, 7.5, 8.0, 8.5, 9.0], np.float32
)
CBV_TARGET_SPEED_EDGES = np.array(
    [5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0], np.float32
)
CBV_ACC_EDGES = np.array(
    [-1.5, -1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0,
     2.5, 3.0], np.float32
)
CBV_JERK_EDGES = np.array(
    [-10.0, -8.0, -6.0, -4.0, -2.0, 0.0, 2.0, 4.0, 6.0, 8.0, 10.0], np.float32
)
EGO_SPEED_EDGES = np.array(
    [0.0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5, 5, 5.5, 6, 8, 10], np.float32
)
EGO_METRIC_EDGES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0], np.float32
)

# uncomfortable-motion bounds (scenario_manager.py:258: acc.x in
# (-4.05, 2.40), |acc.y| < 4.89, |jerk| < 8.37)
UNCOMFORT_ACC_LON = (-4.05, 2.40)
UNCOMFORT_ACC_LAT = 4.89
UNCOMFORT_JERK = 8.37

CRITICALITY_RADIUS = 60.0  # ego nearby-agent search radius (carla_runner.py:75)


def _hist_add_1d(hist, edges, values, weight):
    """Accumulate `values` [S, A] (weighted by bool `weight` [S, A]) into
    `hist` [S, B]. Out-of-range values are dropped (bisect_left semantics of
    statistics_manager.py:324-335: data < edges[0] or >= edges[-1] skipped)."""
    e = jnp.asarray(edges)
    idx = jnp.searchsorted(e, values, side="left") - 1
    ok = weight & (values >= e[0]) & (values < e[-1]) & jnp.isfinite(values)
    idx = jnp.clip(idx, 0, len(edges) - 2)
    oh = jax.nn.one_hot(idx, len(edges) - 1, dtype=hist.dtype)
    return hist + (oh * ok[..., None]).sum(axis=1)


def _hist_add_2d(hist, row_edges, col_edges, row_val, col_val, weight):
    """Accumulate one (row_val, col_val) [S] pair per scenario into the 2-D
    `hist` [S, R, C] (the ego speed x criticality-metric distributions)."""
    re_, ce = jnp.asarray(row_edges), jnp.asarray(col_edges)
    ri = jnp.clip(jnp.searchsorted(re_, row_val, side="left") - 1, 0, len(row_edges) - 2)
    ci = jnp.clip(jnp.searchsorted(ce, col_val, side="left") - 1, 0, len(col_edges) - 2)
    ok = (
        weight
        & (row_val >= re_[0]) & (row_val < re_[-1]) & jnp.isfinite(row_val)
        & (col_val >= ce[0]) & (col_val < ce[-1]) & jnp.isfinite(col_val)
    )
    R, C = len(row_edges) - 1, len(col_edges) - 1
    oh = jax.nn.one_hot(ri * C + ci, R * C, dtype=hist.dtype).reshape(
        (-1, R, C)
    )
    return hist + oh * ok[:, None, None]


@struct.dataclass
class CriteriaState:
    # ego events
    collisions_vehicle: jnp.ndarray  # [S] int32 event count
    collisions_pedestrian: jnp.ndarray  # [S] int32
    collisions_static: jnp.ndarray  # [S] int32
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
    prev_ego_in_stop_zone: jnp.ndarray  # [S] bool (exit-edge detection)
    # MinimumSpeedRouteTest accumulators (atomic_criteria.py:1964-2060:
    # ego speed vs mean speed of background traffic within the 60 m search
    # radius; recorded, penalty 'unused' per PENALTY_PERC_DICT)
    min_speed_ego_sum: jnp.ndarray  # [S] float32
    min_speed_bg_sum: jnp.ndarray  # [S] float32
    min_speed_points: jnp.ndarray  # [S] int32
    done: jnp.ndarray  # [S] bool
    done_tick: jnp.ndarray  # [S] int32
    # CBV live accumulators (behavior metrics, scenario_manager.py:189-301)
    cbv_speed_sum: jnp.ndarray  # [S] float32
    cbv_acc_sum: jnp.ndarray  # [S]
    cbv_jerk_sum: jnp.ndarray  # [S]
    cbv_count: jnp.ndarray  # [S] int32 samples (CBV-ticks; x dt = game time)
    cbv_offroad_ticks: jnp.ndarray  # [S] int32
    cbv_uncomfortable_ticks: jnp.ndarray  # [S] int32
    cbv_collisions: jnp.ndarray  # [S] int32
    prev_cbv_collision: jnp.ndarray  # [S, A] bool
    prev_cbv_acc: jnp.ndarray  # [S, A] float32 |acc| (for jerk)
    # second moments + extra sums for mean±std reporting
    cbv_speed_sq: jnp.ndarray  # [S] float32
    cbv_acc_sq: jnp.ndarray  # [S]
    cbv_jerk_sq: jnp.ndarray  # [S]
    cbv_target_speed_sum: jnp.ndarray  # [S]
    cbv_target_speed_sq: jnp.ndarray  # [S]
    cbv_delta_speed_sum: jnp.ndarray  # [S]
    cbv_delta_speed_sq: jnp.ndarray  # [S]
    # progress / churn counters (scenario_manager.py:245-283)
    cbv_progress_m: jnp.ndarray  # [S] float32 summed per-tick CBV movement
    cbv_reach_goal: jnp.ndarray  # [S] int32
    cbv_new_count: jnp.ndarray  # [S] int32 distinct promotions
    prev_is_cbv: jnp.ndarray  # [S, A] bool (promotion edge)
    # behavior distributions (statistics_manager.py CBV_DATA_BINS)
    cbv_speed_hist: jnp.ndarray  # [S, 12] int32
    cbv_delta_speed_hist: jnp.ndarray  # [S, 19]
    cbv_target_speed_hist: jnp.ndarray  # [S, 7]
    cbv_acc_hist: jnp.ndarray  # [S, 13]
    cbv_jerk_hist: jnp.ndarray  # [S, 10]
    # ego criticality distributions: speed bin x metric bin (EGO_DATA_BINS)
    ego_rttc_hist: jnp.ndarray  # [S, 14, 10] int32
    ego_act_hist: jnp.ndarray  # [S, 14, 10]
    ego_ei_hist: jnp.ndarray  # [S, 14, 10]


def init_criteria(num_scenarios: int, num_agents: int) -> CriteriaState:
    """Host-side (numpy) build; callers device_put with the state."""
    import numpy as jnp  # noqa: F811 — numpy aliased to build host-side

    S, A = num_scenarios, num_agents
    z = jnp.zeros(S, jnp.int32)
    f = jnp.zeros(S, jnp.float32)
    b = jnp.zeros(S, bool)
    return CriteriaState(
        collisions_vehicle=z,
        collisions_pedestrian=z,
        collisions_static=z,
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
        prev_ego_in_stop_zone=b,
        min_speed_ego_sum=f,
        min_speed_bg_sum=f,
        min_speed_points=z,
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
        cbv_speed_sq=f,
        cbv_acc_sq=f,
        cbv_jerk_sq=f,
        cbv_target_speed_sum=f,
        cbv_target_speed_sq=f,
        cbv_delta_speed_sum=f,
        cbv_delta_speed_sq=f,
        cbv_progress_m=f,
        cbv_reach_goal=z,
        cbv_new_count=z,
        prev_is_cbv=jnp.zeros((S, A), bool),
        cbv_speed_hist=jnp.zeros((S, len(CBV_SPEED_EDGES) - 1), jnp.int32),
        cbv_delta_speed_hist=jnp.zeros(
            (S, len(CBV_DELTA_SPEED_EDGES) - 1), jnp.int32
        ),
        cbv_target_speed_hist=jnp.zeros(
            (S, len(CBV_TARGET_SPEED_EDGES) - 1), jnp.int32
        ),
        cbv_acc_hist=jnp.zeros((S, len(CBV_ACC_EDGES) - 1), jnp.int32),
        cbv_jerk_hist=jnp.zeros((S, len(CBV_JERK_EDGES) - 1), jnp.int32),
        ego_rttc_hist=jnp.zeros(
            (S, len(EGO_SPEED_EDGES) - 1, len(EGO_METRIC_EDGES) - 1), jnp.int32
        ),
        ego_act_hist=jnp.zeros(
            (S, len(EGO_SPEED_EDGES) - 1, len(EGO_METRIC_EDGES) - 1), jnp.int32
        ),
        ego_ei_hist=jnp.zeros(
            (S, len(EGO_SPEED_EDGES) - 1, len(EGO_METRIC_EDGES) - 1), jnp.int32
        ),
    )


def update_criteria(
    crit: CriteriaState,
    state: SimState,
    spec: ScenarioSpec,
    dt: float = 0.1,
    tmap=None,
) -> CriteriaState:
    ego_speed = state.speed[:, 0]
    ego_pos = state.pos[:, 0]
    ego_collision = state.collision[:, 0]
    running = ~crit.done

    # collision events: rising edge only (CollisionTest dedupes repeated
    # contact with the same actor, atomic_criteria.py:289-423), classified
    # by the hit agent's class (blueprint dispatch in the reference)
    new_collision = ego_collision & ~crit.prev_ego_collision & running
    hit_slot = jnp.maximum(state.collided_with[:, 0], 0)
    hit_class = jnp.take_along_axis(
        state.agent_class, hit_slot[:, None], axis=1
    )[:, 0]
    collisions_vehicle = crit.collisions_vehicle + (
        new_collision & (hit_class == 0)
    ).astype(jnp.int32)
    collisions_pedestrian = crit.collisions_pedestrian + (
        new_collision & (hit_class == 1)
    ).astype(jnp.int32)
    collisions_static = crit.collisions_static + (
        new_collision & (hit_class == 2)
    ).astype(jnp.int32)

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

    # outside-route-lanes accounting: meters driven while off-road OR
    # against the bound lane's direction (OutsideRouteLanesTest counts
    # wrong-lane/sidewalk driving too, atomic_criteria.py:992-1176; the
    # drivable raster is the sidewalk equivalent, heading-vs-lane the
    # wrong-direction term — >120 deg so transient swings don't count)
    step_m = ego_speed * dt * running
    driven = crit.driven_meters + step_m
    outside_now = state.offroad[:, 0]
    if tmap is not None:
        lane0 = jnp.maximum(state.lane[:, 0], 0)
        _, _, lane_hd = tmap.project(lane0, ego_pos)
        wrong_dir = jnp.cos(state.heading[:, 0] - lane_hd) < -0.5
        outside_now = outside_now | (wrong_dir & (state.lane[:, 0] >= 0))
    outside = crit.outside_lane_meters + step_m * outside_now

    # red-light infraction (RunningRedLightTest: entering a signalised
    # connector while its light is red; detected by the world tick)
    red_light = crit.red_light_infractions + (
        state.ego_red_entry & running
    ).astype(jnp.int32)

    # stop sign: ego left the stop zone without having halted inside it
    # (RunningStopTest exit-edge semantics; the halt latch lives in SimState)
    in_zone_ego = state.in_stop_zone[:, 0]
    exit_edge = crit.prev_ego_in_stop_zone & ~in_zone_ego
    stop_infractions = crit.stop_infractions + (
        exit_edge & ~state.stopped_at_stop[:, 0] & running
    ).astype(jnp.int32)

    # min-speed vs surrounding background traffic (60 m search radius,
    # carla_runner.py:75)
    veh = state.alive & (state.agent_class == 0)
    veh = veh.at[:, 0].set(False)
    near = veh & (
        jnp.linalg.norm(state.pos - ego_pos[:, None], axis=-1) < 60.0
    )
    n_near = near.sum(-1)
    has_bg = (n_near > 0) & running
    bg_mean = jnp.sum(state.speed * near, axis=-1) / jnp.maximum(n_near, 1)
    min_speed_ego_sum = crit.min_speed_ego_sum + ego_speed * has_bg
    min_speed_bg_sum = crit.min_speed_bg_sum + bg_mean * has_bg
    min_speed_points = crit.min_speed_points + has_bg.astype(jnp.int32)

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
    # (compute_live_statistics, scenario_manager.py:189-301: per-tick speed /
    # |acc| / jerk samples, game-time ratios, progress, target/delta speed,
    # reach-goal and promotion counts, behavior histograms)
    cbv = state.is_cbv & state.alive
    n_cbv = cbv.sum(-1).astype(jnp.int32)
    acc_lon = state.accel
    acc_lat = state.speed * state.yaw_rate  # centripetal (vehicle frame y)
    acc_mag = jnp.hypot(acc_lon, acc_lat)
    jerk = (acc_mag - crit.prev_cbv_acc) / dt
    cbv_live = cbv & running[:, None]
    cbv_f = cbv_live.astype(jnp.float32)
    uncomfortable = ~(
        (acc_lon > UNCOMFORT_ACC_LON[0])
        & (acc_lon < UNCOMFORT_ACC_LON[1])
        & (jnp.abs(acc_lat) < UNCOMFORT_ACC_LAT)
        & (jnp.abs(jerk) < UNCOMFORT_JERK)
    )
    new_cbv_col = state.collision & cbv & ~crit.prev_cbv_collision

    # per-tick movement of each CBV (history ring holds last-tick positions)
    step_dist = jnp.linalg.norm(
        state.hist_pos[:, :, -1] - state.hist_pos[:, :, -2], axis=-1
    ) * state.hist_valid[:, :, -2]

    # target speed = lane speed limit (CBV.get_speed_limit()/3.6)
    if tmap is not None:
        target_speed = tmap.speed_limit[state.lane]
    else:
        target_speed = jnp.full_like(state.speed, 8.0)
    delta_speed = target_speed - state.speed

    reached = (
        state.is_cbv
        & state.goal_valid
        & (jnp.linalg.norm(state.pos - state.goal, axis=-1) < 3.0)
    )
    promoted = state.is_cbv & ~crit.prev_is_cbv

    # ---------------------------------------------------- ego criticality
    # (compute_ego_critical_metrics: min RTTC/ACT, max EI over nearby
    # agents, binned into speed x metric 2-D distributions)
    from .metrics import ego_criticality

    nbr_valid = state.alive & (
        jnp.linalg.norm(state.pos - ego_pos[:, None], axis=-1)
        < CRITICALITY_RADIUS
    )
    nbr_valid = nbr_valid.at[:, 0].set(False)
    critm = ego_criticality(
        ego_pos, state.heading[:, 0], ego_speed, state.shape[:, 0],
        state.pos, state.heading, state.speed, state.shape,
        nbr_valid,
    )
    ego_w = running

    return crit.replace(
        collisions_vehicle=collisions_vehicle,
        collisions_pedestrian=collisions_pedestrian,
        collisions_static=collisions_static,
        prev_ego_collision=ego_collision,
        blocked_ticks=blocked_ticks,
        blocked=blocked,
        route_deviation=route_deviation,
        outside_lane_meters=outside,
        driven_meters=driven,
        timeout=timeout,
        route_complete=route_complete,
        red_light_infractions=red_light,
        stop_infractions=stop_infractions,
        prev_ego_in_stop_zone=in_zone_ego,
        min_speed_ego_sum=min_speed_ego_sum,
        min_speed_bg_sum=min_speed_bg_sum,
        min_speed_points=min_speed_points,
        done=done,
        done_tick=done_tick,
        cbv_speed_sum=crit.cbv_speed_sum + (state.speed * cbv_f).sum(-1),
        cbv_acc_sum=crit.cbv_acc_sum + (acc_mag * cbv_f).sum(-1),
        cbv_jerk_sum=crit.cbv_jerk_sum + (jerk * cbv_f).sum(-1),
        cbv_count=crit.cbv_count + (n_cbv * running).astype(jnp.int32),
        # gated on `running` like the speed/acc/jerk sums: frozen scenarios
        # must not keep inflating the event counters vs the gated cbv_count
        cbv_offroad_ticks=crit.cbv_offroad_ticks
        + (state.offroad & cbv_live).sum(-1).astype(jnp.int32),
        cbv_uncomfortable_ticks=crit.cbv_uncomfortable_ticks
        + (uncomfortable & cbv_live).sum(-1).astype(jnp.int32),
        cbv_collisions=crit.cbv_collisions
        + (new_cbv_col & running[:, None]).sum(-1).astype(jnp.int32),
        prev_cbv_collision=state.collision & cbv,
        prev_cbv_acc=acc_mag,
        cbv_speed_sq=crit.cbv_speed_sq + (state.speed**2 * cbv_f).sum(-1),
        cbv_acc_sq=crit.cbv_acc_sq + (acc_mag**2 * cbv_f).sum(-1),
        cbv_jerk_sq=crit.cbv_jerk_sq + (jerk**2 * cbv_f).sum(-1),
        cbv_target_speed_sum=crit.cbv_target_speed_sum
        + (target_speed * cbv_f).sum(-1),
        cbv_target_speed_sq=crit.cbv_target_speed_sq
        + (target_speed**2 * cbv_f).sum(-1),
        cbv_delta_speed_sum=crit.cbv_delta_speed_sum
        + (delta_speed * cbv_f).sum(-1),
        cbv_delta_speed_sq=crit.cbv_delta_speed_sq
        + (delta_speed**2 * cbv_f).sum(-1),
        cbv_progress_m=crit.cbv_progress_m + (step_dist * cbv_f).sum(-1),
        cbv_reach_goal=crit.cbv_reach_goal
        + (reached & running[:, None]).sum(-1).astype(jnp.int32),
        cbv_new_count=crit.cbv_new_count
        + (promoted & running[:, None]).sum(-1).astype(jnp.int32),
        prev_is_cbv=state.is_cbv,
        cbv_speed_hist=_hist_add_1d(
            crit.cbv_speed_hist, CBV_SPEED_EDGES, state.speed, cbv_live
        ),
        cbv_delta_speed_hist=_hist_add_1d(
            crit.cbv_delta_speed_hist, CBV_DELTA_SPEED_EDGES, delta_speed,
            cbv_live,
        ),
        cbv_target_speed_hist=_hist_add_1d(
            crit.cbv_target_speed_hist, CBV_TARGET_SPEED_EDGES, target_speed,
            cbv_live,
        ),
        cbv_acc_hist=_hist_add_1d(
            crit.cbv_acc_hist, CBV_ACC_EDGES, acc_mag, cbv_live
        ),
        cbv_jerk_hist=_hist_add_1d(
            crit.cbv_jerk_hist, CBV_JERK_EDGES, jerk, cbv_live
        ),
        ego_rttc_hist=_hist_add_2d(
            crit.ego_rttc_hist, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
            ego_speed, critm["RTTC"], ego_w,
        ),
        ego_act_hist=_hist_add_2d(
            crit.ego_act_hist, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
            ego_speed, critm["ACT"], ego_w,
        ),
        ego_ei_hist=_hist_add_2d(
            crit.ego_ei_hist, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
            ego_speed, critm["EI"], ego_w,
        ),
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
        * PENALTY_COLLISION_PEDESTRIAN
        ** crit.collisions_pedestrian.astype(jnp.float32)
        * PENALTY_COLLISION_STATIC ** crit.collisions_static.astype(jnp.float32)
        * PENALTY_RED_LIGHT ** crit.red_light_infractions.astype(jnp.float32)
        * PENALTY_STOP_SIGN ** crit.stop_infractions.astype(jnp.float32)
        * jnp.where(crit.timeout, PENALTY_TIMEOUT, 1.0)
    )
    return rc_eff * penalty, rc, penalty
