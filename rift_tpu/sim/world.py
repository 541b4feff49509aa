"""The world tick: one fused, jittable step for all scenarios and agents.

Replaces the reference's CARLA server round-trip
(rift/gym_carla/envs/env_wrapper.py:127-197: apply controls -> world.tick()
RPC -> refresh caches) with a pure function over SimState. One call advances
every scenario in the batch; `vmap`/sharding over the scenario axis is free
because every op is already batched on [S, A].

Control merge order per agent slot:
  1. raw control (`ctrl_mask`) — external throttle/steer/brake;
  2. trajectory tracking (`traj_mask`) — local waypoints through the shared
     PID tracker (how Pluto CBVs and waypoint egos drive, pluto.py:249-259);
  3. otherwise the IDM lane-follow autopilot (TrafficManager stand-in).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.obb import obb_overlap
from ..geometry.se2 import wrap_angle
from ..map.tensor_map import TensorMap
from .autopilot import (
    LOOKAHEAD_WAYPOINTS,
    TM_SPEED_FACTOR,
    find_leaders,
    idm_target_speed,
    lane_follow_waypoints,
    yield_target_speed,
)
from .dynamics import bicycle_step
from .pid import extend_path, track_step
from .state import CLASS_STATIC, CLASS_WALKER, ScenarioSpec, SimState
from .stop_signs import stop_target_speed, stop_zone_info, update_stop_memory
from .traffic_lights import ego_red_light_entry, red_ahead

GOAL_RADIUS = 3.0  # CBV reach-goal distance (route_planner.py reach check)
WALKER_RANGE = 15.0  # crossing distance from the curb anchor before halting
# walker patrol schedule: one outbound + one homebound leg per period, with
# curb dwell filling whatever the leg does not use (slowest walker 0.8 m/s
# covers 15 m in 188 ticks < the 250-tick half period)
WALKER_PERIOD = 500


def autopilot_target_speed(
    tmap: TensorMap, state: SimState, dt: float = 0.1
) -> jnp.ndarray:
    """Privileged IDM target speed per agent [S, A]: leader gap + speed
    limit + red lights + stop signs. Doubles as the SFT/RS teacher signal
    (the reference's AutoPilot target speed, sft/teacher/autopilot.py)."""
    leaders = find_leaders(
        state.pos, state.heading, state.speed, state.shape, state.alive
    )
    v_limit = tmap.speed_limit[state.lane] * TM_SPEED_FACTOR
    v_target = idm_target_speed(state.speed, v_limit, leaders, dt)
    # stop for red lights at the approach stop line
    must_stop, _ = red_ahead(tmap, state.lane, state.pos, state.tick)
    v_target = jnp.where(must_stop, 0.0, v_target)
    # junction negotiation (TrafficManager stand-in): wait for cross
    # traffic / walkers occupying the junction box before entering
    v_target = yield_target_speed(tmap, state, v_target)
    # stop signs: creep to the line, halt once, then proceed
    return stop_target_speed(
        tmap, state.lane, state.pos, state.stopped_at_stop, v_target
    )


def autopilot_steady_speed(
    tmap: TensorMap, state: SimState
) -> jnp.ndarray:
    """Privileged DESIRED speed per agent [S, A]: what a competent driver
    settles at given the current leader gap, speed limit, lights and stop
    signs — the teacher's v_target (the reference teacher integrates IDM
    toward this target over its horizon, sft/teacher/autopilot.py:375-440).

    Unlike `autopilot_target_speed` (one-second IDM integration from the
    agent's CURRENT speed), this is independent of own speed: a stopped
    agent's teacher says "accelerate to the limit", not "stay stopped" —
    without that, bootstrap behavior cloning collapses into a crawl
    equilibrium (the r3 quality table's 0.4 m/s CBVs)."""
    from .autopilot import IDM_BRAKE, IDM_MIN_GAP

    leaders = find_leaders(
        state.pos, state.heading, state.speed, state.shape, state.alive
    )
    v_limit = tmap.speed_limit[state.lane] * TM_SPEED_FACTOR
    # safe approach speed toward the leader (comfortable-brake profile):
    # from gap g, can drive leader.speed + sqrt(2 b (g - s0)) and still
    # settle behind it
    slack = jnp.maximum(leaders.gap - IDM_MIN_GAP, 0.0)
    v_app = leaders.speed + jnp.sqrt(2.0 * IDM_BRAKE * slack)
    v_target = jnp.where(
        jnp.isfinite(leaders.gap), jnp.minimum(v_limit, v_app), v_limit
    )
    must_stop, _ = red_ahead(tmap, state.lane, state.pos, state.tick)
    v_target = jnp.where(must_stop, 0.0, v_target)
    v_target = yield_target_speed(tmap, state, v_target)
    return stop_target_speed(
        tmap, state.lane, state.pos, state.stopped_at_stop, v_target
    )


def autopilot_waypoints(
    tmap: TensorMap, state: SimState, dt: float
) -> jnp.ndarray:
    """IDM lane-follow waypoints for every agent -> [S, A, N, 2] local frame."""
    v_target = autopilot_target_speed(tmap, state, dt)
    spacing = jnp.maximum(v_target * dt, 1e-3)
    return lane_follow_waypoints(
        tmap,
        state.lane,
        state.pos,
        state.heading,
        state.bv_branch_bits,
        spacing,
    )


@partial(jax.jit, static_argnames=("dt",))
def step(
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    traj: jnp.ndarray | None = None,  # [S, A, T, 2] local waypoints
    traj_mask: jnp.ndarray | None = None,  # [S, A] bool
    ctrl: jnp.ndarray | None = None,  # [S, A, 3]
    ctrl_mask: jnp.ndarray | None = None,  # [S, A] bool
    dt: float = 0.1,
) -> SimState:
    S, A = state.num_scenarios, state.num_agents

    # ------------------------------------------------------------------
    # 1-2. control resolution
    # ------------------------------------------------------------------
    # the tracker wants the candidate's FULL horizon: the reference PID
    # resamples all 80 frames for its desired speed (pid_controller.py:57-76)
    # — a 30-point clip fed it only the low-information early window
    wp = autopilot_waypoints(tmap, state, dt)  # [S, A, N, 2]
    if traj is not None:
        n = max(traj.shape[-2], LOOKAHEAD_WAYPOINTS)
        wp = extend_path(wp, n)
        traj = extend_path(traj, n)
        wp = jnp.where(traj_mask[..., None, None], traj, wp)

    action, tracker = track_step(state.tracker, wp, state.speed)
    if ctrl is not None:
        action = jnp.where(ctrl_mask[..., None], ctrl, action)

    # dead agents: full brake, no movement below
    action = jnp.where(state.alive[..., None], action, jnp.array([0.0, 0.0, 1.0]))
    # walkers: zero control (their PID output over lane waypoints is
    # meaningless — they move by the patrol logic below). Keeps every
    # constant-control forecast consumer (ego/pdm_ego.py hazard sweep, the
    # evaluator's neighbor rollout) propagating pedestrians as constant
    # velocity along their walk heading — the reference forecasts walkers
    # exactly so (pdm_lite autopilot.py forecast_walkers)
    action = jnp.where(
        (state.agent_class == CLASS_WALKER)[..., None],
        jnp.zeros(3), action,
    )

    # ------------------------------------------------------------------
    # 3-4. dynamics
    # ------------------------------------------------------------------
    new_pos, new_heading, new_speed = bicycle_step(
        state.pos, state.heading, state.speed, action, dt
    )

    # walkers: curb-to-curb PATROL from their anchor (stored in `goal`) —
    # CARLA's walker AI controller behavior (round 2 halted after one
    # crossing; VERDICT r2 item 10): walk out while the schedule's
    # outbound half-period holds and the far curb is not reached, dwell at
    # the curb, then walk home, dwell, repeat. The intrinsic walking speed
    # derives from the agent's spawn bits so the dwell (speed 0) never
    # destroys it.
    is_walker = state.agent_class == CLASS_WALKER
    is_static = state.agent_class == CLASS_STATIC
    walker_v = 0.8 + 0.8 * (
        (state.bv_branch_bits >> 8) & 0xFF
    ).astype(jnp.float32) / 255.0
    phase = (
        state.tick[:, None].astype(jnp.int32)
        + ((state.bv_branch_bits >> 16) % WALKER_PERIOD).astype(jnp.int32)
    ) % WALKER_PERIOD
    outbound = phase < (WALKER_PERIOD // 2)
    disp = state.pos - state.goal  # patrol anchor lives in `goal`
    progress = jnp.linalg.norm(disp, axis=-1)
    go_out = outbound & (progress < WALKER_RANGE)
    go_home = ~outbound & (progress > 0.3)
    # heading FOLLOWS the walk direction (CARLA walkers turn around at the
    # curb; walking backwards recorded velocities opposite the heading,
    # corrupting history features and constant-velocity forecasts): away
    # from the anchor while outbound, toward it while homebound
    away = jnp.where(
        (progress > 0.15)[..., None],
        disp / jnp.maximum(progress, 1e-6)[..., None],
        jnp.stack([jnp.cos(state.heading), jnp.sin(state.heading)], axis=-1),
    )
    walk_vec = jnp.where(go_out[..., None], away, -away)
    walking = go_out | go_home
    walk_heading = jnp.where(
        walking, jnp.arctan2(walk_vec[..., 1], walk_vec[..., 0]),
        state.heading,
    )
    walker_speed = walker_v * walking.astype(jnp.float32)
    walker_pos = state.pos + walker_speed[..., None] * dt * walk_vec
    new_pos = jnp.where(is_walker[..., None], walker_pos, new_pos)
    new_heading = jnp.where(is_walker, walk_heading, new_heading)
    new_speed = jnp.where(is_walker, walker_speed, new_speed)
    # statics never move
    frozen_agent = ~state.alive | is_static
    new_pos = jnp.where(frozen_agent[..., None], state.pos, new_pos)
    new_heading = jnp.where(frozen_agent, state.heading, new_heading)
    new_speed = jnp.where(frozen_agent, jnp.where(is_static, 0.0, new_speed), new_speed)
    new_speed = jnp.where(state.alive, new_speed, 0.0)

    accel = (new_speed - state.speed) / dt
    yaw_rate = wrap_angle(new_heading - state.heading) / dt

    # ------------------------------------------------------------------
    # 5. history ring (shift left, append)
    # ------------------------------------------------------------------
    vel = new_speed[..., None] * jnp.stack(
        [jnp.cos(new_heading), jnp.sin(new_heading)], axis=-1
    )
    hist_pos = jnp.concatenate(
        [state.hist_pos[:, :, 1:], new_pos[:, :, None]], axis=2
    )
    hist_heading = jnp.concatenate(
        [state.hist_heading[:, :, 1:], new_heading[:, :, None]], axis=2
    )
    hist_vel = jnp.concatenate(
        [state.hist_vel[:, :, 1:], vel[:, :, None]], axis=2
    )
    hist_valid = jnp.concatenate(
        [state.hist_valid[:, :, 1:], state.alive[:, :, None]], axis=2
    )

    # ------------------------------------------------------------------
    # 6. lane binding
    # ------------------------------------------------------------------
    new_lane = tmap.nearest_lane(new_pos, new_heading)  # [S, A]
    red_entry = ego_red_light_entry(
        tmap, state.lane[:, 0], new_lane[:, 0], state.tick
    )
    # stop-sign memory: zone membership + halt latch
    _, in_zone_now, _ = stop_zone_info(tmap, new_lane, new_pos)
    in_stop_zone, stopped_at_stop = update_stop_memory(
        state.in_stop_zone, state.stopped_at_stop, in_zone_now, new_speed
    )

    # advance fork bits when the lane actually changes so each junction gets
    # a fresh pseudo-random choice
    lane_changed = new_lane != state.lane
    branch_bits = jnp.where(
        lane_changed,
        state.bv_branch_bits * jnp.uint32(1664525) + jnp.uint32(1013904223),
        state.bv_branch_bits,
    )

    # ------------------------------------------------------------------
    # 7. collisions (all-pairs OBB SAT within each scenario)
    # ------------------------------------------------------------------
    overlap = obb_overlap(
        new_pos[:, :, None],
        new_heading[:, :, None],
        state.shape[:, :, None],
        new_pos[:, None, :],
        new_heading[:, None, :],
        state.shape[:, None, :],
    )  # [S, A, A]
    pair_alive = state.alive[:, :, None] & state.alive[:, None, :]
    eye = jnp.eye(A, dtype=bool)[None]
    hit = overlap & pair_alive & ~eye
    collision = hit.any(-1)
    collided_with = jnp.where(collision, jnp.argmax(hit, axis=-1), -1).astype(
        jnp.int32
    )

    # ------------------------------------------------------------------
    # 8. off-road (vehicles only — walkers legitimately leave the road)
    # ------------------------------------------------------------------
    offroad = ~tmap.on_road(new_pos) & state.alive & ~is_walker & ~is_static

    # ------------------------------------------------------------------
    # 9. ego route progress (1 m waypoint spacing -> nearest index ~ meters)
    # ------------------------------------------------------------------
    ego_pos = new_pos[:, 0]
    route_pts = spec.ego_route[..., :2]  # [S, RW, 2]
    rw = route_pts.shape[1]
    route_valid = jnp.arange(rw)[None] < spec.ego_route_len[:, None]
    d2r = jnp.sum((route_pts - ego_pos[:, None]) ** 2, axis=-1)
    d2r = jnp.where(route_valid, d2r, jnp.inf)
    proj = jnp.argmin(d2r, axis=-1).astype(jnp.float32)
    cursor = jnp.maximum(state.ego_route_cursor, proj)

    return state.replace(
        pos=new_pos,
        heading=new_heading,
        speed=new_speed,
        accel=accel,
        yaw_rate=yaw_rate,
        control=action,
        hist_pos=hist_pos,
        hist_heading=hist_heading,
        hist_vel=hist_vel,
        hist_valid=hist_valid,
        lane=new_lane,
        bv_branch_bits=branch_bits,
        in_stop_zone=in_stop_zone,
        stopped_at_stop=stopped_at_stop,
        tracker=tracker,
        collision=collision,
        collided_with=collided_with,
        offroad=offroad,
        ego_red_entry=red_entry,
        ego_route_cursor=cursor,
        tick=state.tick + 1,
    )


def cbv_reached_goal(state: SimState) -> jnp.ndarray:
    """[S, A] bool: CBV within GOAL_RADIUS of its goal."""
    d = jnp.linalg.norm(state.pos - state.goal, axis=-1)
    return state.is_cbv & state.goal_valid & (d < GOAL_RADIUS)
