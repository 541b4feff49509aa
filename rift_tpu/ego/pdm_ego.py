"""PDM-Lite-style privileged rule ego with forecast-based hazard avoidance.

The full-strength port of the reference's default ego expert
(rift/ego/pdm_lite/autopilot.py): forecast every nearby vehicle with the
constant-control kinematic bicycle (906-1051), sweep the ego's planned route
positions against the forecasted boxes (OBB checks, 1236-1310), and feed the
earliest hazard into IDM (375-440; RK45 integration replaced by fixed-step
Euler — equivalent at t_bound 0.05 s) to get the target speed. Route
following + the shared PID tracker turn that into controls.

Improvement over ego/rule_ego.py's leader-gap IDM: crossing traffic at
junctions is detected because hazards come from forecasts intersecting the
route, not just same-lane leaders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.obb import obb_overlap
from ..sim.autopilot import path_follow_waypoints
from ..sim.dynamics import bicycle_forecast_step
from ..sim.state import ScenarioSpec, SimState

# IDM parameters (rift/ego/pdm_lite/config.py)
IDM_A_MAX = 24.0  # idm_maximum_acceleration (expert is aggressive)
IDM_B_HIGH = 3.72  # comfortable braking, high speed
IDM_B_LOW = 8.7  # comfortable braking, low speed
IDM_B_THRESHOLD = 6.02  # speed threshold between the two
IDM_DELTA = 4.0
IDM_T_BOUND = 0.05
IDM_S0_VEHICLE = 4.0
IDM_T_VEHICLE = 0.25

FORECAST_STEPS = 40  # 4 s at 10 fps (reference uses up to 80)
ROUTE_LOOKAHEAD = 40  # route meters swept for hazards
SAFETY_WIDTH_INFLATION = 1.2
# stuck-recovery creep (autopilot.py:1053-1205)
STUCK_WINDOW = 15  # history ticks of near-zero displacement = stuck
CREEP_SPEED = 1.5  # m/s un-wedging speed
CREEP_MIN_GAP = 5.5  # never creep toward a hazard closer than this


def _idm_target_speed(
    desired_speed, ego_speed, hazard_speed, hazard_distance, hazard_length
):
    """Euler-integrated IDM over IDM_T_BOUND (the reference integrates the
    same ODE with RK45 for 0.05 s — one step at 10 fps resolution)."""
    b = jnp.where(ego_speed > IDM_B_THRESHOLD, IDM_B_HIGH, IDM_B_LOW)
    speed_diff = ego_speed - hazard_speed
    s_star = IDM_S0_VEHICLE + ego_speed * IDM_T_VEHICLE + ego_speed * speed_diff / (
        2.0 * jnp.sqrt(IDM_A_MAX * b)
    )
    s = jnp.maximum(0.1, hazard_distance - hazard_length)
    dvdt = IDM_A_MAX * (
        1.0
        - (ego_speed / jnp.maximum(desired_speed, 0.1)) ** IDM_DELTA
        - (s_star / s) ** 2
    )
    return jnp.maximum(ego_speed + IDM_T_BOUND * dvdt, 0.0)


LC_BLOCK_AHEAD = 30.0  # leader window that triggers/holds a lane change (m)
LC_BEHIND = -2.0  # leader counts as "ahead" until fully passed
LC_OCC_BACK, LC_OCC_AHEAD = -8.0, 35.0  # adjacent-lane clearance window
# lateral transition length: the ramp is anchored at the vehicle each tick
# (stateless), so the steady-state displacement is ramp(aim distance) * w —
# 8 m puts the aim point (5-8 m, pid.py) at 0.6-1.0 of the full offset
LC_RAMP_M = 8.0


@partial(jax.jit, static_argnames=("dt", "num_points", "lane_change"))
def pdm_ego_waypoints(
    spec: ScenarioSpec,
    state: SimState,
    tmap=None,
    dt: float = 0.1,
    num_points: int = 30,
    lane_change: bool = False,
) -> jnp.ndarray:
    """[S, N, 2] local-frame waypoints for agent slot 0.

    `lane_change=True` is the 'expert' behavior (the leaderboard-autopilot
    variant): when a slow same-lane leader blocks the route and an adjacent
    lane is clear, the planned waypoints shift laterally into that lane to
    overtake and merge back once past — the TPU equivalent of the privileged
    route planner's lane-change routes
    (rift/ego/expert/privileged_route_planner.py:869). pdm_lite (False)
    stays in lane and brakes via IDM, like the reference default."""
    S, A = state.alive.shape

    # ---- forecast all agents (constant control) over FORECAST_STEPS
    def fbody(carry, _):
        p, h, v = carry
        np_, nh, nv = bicycle_forecast_step(p, h, v, state.control)
        return (np_, nh, nv), (np_, nh, nv)

    _, (fp, fh, fv) = jax.lax.scan(
        fbody, (state.pos, state.heading, state.speed), None,
        length=FORECAST_STEPS,
    )
    # [T, S, A, ...] -> [S, A, T, ...]
    fp = jnp.moveaxis(fp, 0, 2)
    fh = jnp.moveaxis(fh, 0, 2)
    fv = jnp.moveaxis(fv, 0, 2)

    # ---- ego route sweep: positions along the route at matching times,
    # assuming current ego speed (conservative when accelerating)
    route = spec.ego_route  # [S, RW, 3]
    rw = route.shape[1]
    route_valid = jnp.arange(rw)[None] < spec.ego_route_len[:, None]
    d2r = jnp.sum((route[..., :2] - state.pos[:, 0][:, None]) ** 2, axis=-1)
    d2r = jnp.where(route_valid, d2r, jnp.inf)
    cursor = jnp.argmin(d2r, axis=-1)  # [S]

    t_idx = jnp.arange(FORECAST_STEPS, dtype=jnp.float32)
    adv = jnp.maximum(state.speed[:, 0:1], 2.0) * dt * t_idx[None]  # [S, T] m
    sweep_idx = jnp.minimum(
        cursor[:, None] + adv.astype(jnp.int32), spec.ego_route_len[:, None] - 1
    )  # [S, T]
    sweep_pos = jnp.take_along_axis(
        route[..., :2], sweep_idx[..., None].repeat(2, -1), axis=1
    )  # [S, T, 2]
    sweep_heading = jnp.take_along_axis(route[..., 2], sweep_idx, axis=1)

    ego_shape = state.shape[:, 0] * jnp.array([SAFETY_WIDTH_INFLATION, 1.0])

    # ---- hazard: ego swept box vs every agent's forecast box per timestep
    other = jnp.arange(A) != 0
    hit = obb_overlap(
        sweep_pos[:, None],  # [S, 1, T, 2]
        sweep_heading[:, None],
        jnp.broadcast_to(ego_shape[:, None, None], (S, 1, FORECAST_STEPS, 2)),
        fp[:, :, :],  # [S, A, T, 2]
        fh,
        jnp.broadcast_to(state.shape[:, :, None], (S, A, FORECAST_STEPS, 2)),
    )  # [S, A, T]
    hit &= (state.alive & other)[:, :, None]

    any_hit = hit.any(axis=(1, 2))
    first_t = jnp.where(
        hit.any(axis=1).any(axis=-1),
        jnp.argmax(hit.any(axis=1), axis=-1),
        FORECAST_STEPS - 1,
    )  # [S] first hazard timestep
    hazard_at_t = hit[jnp.arange(S), :, first_t]  # [S, A]
    hazard_agent = jnp.argmax(hazard_at_t, axis=-1)
    hazard_dist = adv[jnp.arange(S), first_t]
    hazard_speed = fv[jnp.arange(S), hazard_agent, first_t]
    hazard_len = state.shape[jnp.arange(S), hazard_agent, 1]

    desired = jnp.where(spec.ego_target_speed > 0, spec.ego_target_speed, 8.0)
    v_idm = _idm_target_speed(
        desired, state.speed[:, 0], hazard_speed, hazard_dist, hazard_len
    )
    v_target = jnp.where(any_hit, jnp.minimum(v_idm, desired), desired)

    # stuck-recovery creep (reference autopilot.py:1053-1205): an ego that
    # has barely moved for STUCK_WINDOW ticks with no imminent hazard creeps
    # forward to un-wedge from over-conservative forecasts (deadlocks with
    # a stopped CBV otherwise end as EBR). Derived from the history ring —
    # red-light/stop-sign overrides below still force 0 at controlled stops.
    disp = jnp.linalg.norm(
        state.hist_pos[:, 0, -1] - state.hist_pos[:, 0, -STUCK_WINDOW],
        axis=-1,
    )
    stuck = (
        (disp < 0.2)
        & state.hist_valid[:, 0, -STUCK_WINDOW]
        & (state.speed[:, 0] < 0.5)
    )
    safe_gap = ~any_hit | (hazard_dist > CREEP_MIN_GAP)
    v_target = jnp.where(
        stuck & safe_gap, jnp.maximum(v_target, CREEP_SPEED), v_target
    )

    # red-light stop (pdm_lite autopilot.py:1053-1205 equivalent)
    if tmap is not None:
        from ..sim.stop_signs import stop_target_speed
        from ..sim.traffic_lights import red_ahead

        must_stop, _ = red_ahead(
            tmap, state.lane[:, :1], state.pos[:, :1], state.tick
        )
        v_target = jnp.where(must_stop[:, 0], 0.0, v_target)
        # stop signs: creep to the line, halt once, then proceed
        v_target = stop_target_speed(
            tmap, state.lane[:, 0], state.pos[:, 0],
            state.stopped_at_stop[:, 0], v_target,
        )

    offset = jnp.zeros(S)
    if lane_change and tmap is not None:
        # ROUTE-frame geometry: bands are anchored to the route corridor,
        # not the ego's current lane binding, so the decision is stable
        # while the ego is displaced mid-overtake (the blocker stays "in the
        # route band ahead" until the ego's route projection passes it)
        r_pt = jnp.take_along_axis(
            route[..., :2], cursor[:, None, None].repeat(2, -1), axis=1
        )[:, 0]  # [S, 2] ego's route projection
        r_hd = jnp.take_along_axis(route[..., 2], cursor[:, None], axis=1)[:, 0]
        c0, s0 = jnp.cos(r_hd), jnp.sin(r_hd)
        rel = state.pos - r_pt[:, None]  # [S, A, 2]
        ax = rel[..., 0] * c0[:, None] + rel[..., 1] * s0[:, None]
        ay = -rel[..., 0] * s0[:, None] + rel[..., 1] * c0[:, None]
        others = state.alive & (jnp.arange(A)[None] != 0)

        lane0 = jnp.maximum(state.lane[:, 0], 0)
        w = tmap.width[lane0]
        slow = state.speed < 0.6 * desired[:, None]
        # blocked: a slow vehicle in the route corridor ahead (holds while
        # passing, clears once the blocker is behind -> merge back)
        in_route_band = (jnp.abs(ay) < 0.6 * w[:, None]) & (
            ax > LC_BEHIND
        ) & (ax < LC_BLOCK_AHEAD)
        blocked = (in_route_band & others & slow).any(-1)

        def clear(side):
            band = (
                (jnp.abs(ay - side * w[:, None]) < 0.6 * w[:, None])
                & (ax > LC_OCC_BACK)
                & (ax < LC_OCC_AHEAD)
            )
            return ~(band & others).any(-1)

        # a pass lane exists where the road is drivable one lane-width off
        # the ROUTE centerline (probing the map, not the ego's current lane
        # adjacency, keeps the side choice stable after the ego re-binds to
        # the pass lane mid-overtake)
        normal = jnp.stack([-s0, c0], -1)  # route-left unit
        probe_ahead = 0.5 * LC_OCC_AHEAD
        probe_base = r_pt + probe_ahead * jnp.stack([c0, s0], -1)
        exists_l = tmap.on_road(probe_base + w[:, None] * normal)
        exists_r = tmap.on_road(probe_base - w[:, None] * normal)
        can_left = exists_l & clear(+1.0)
        can_right = exists_r & clear(-1.0)
        # don't start a change inside a junction
        on_junction = tmap.is_junction[lane0]
        do_change = blocked & (can_left | can_right) & ~on_junction
        side = jnp.where(can_left, 1.0, -1.0)
        offset = jnp.where(do_change, side * w, 0.0)
        # while overtaking, don't IDM-brake for the blocker being passed
        # (the route sweep still sees it; crossing hazards keep braking)
        hz_in_band = (
            any_hit
            & (ax[jnp.arange(S), hazard_agent] > LC_BEHIND)
            & (jnp.abs(ay[jnp.arange(S), hazard_agent]) < 0.6 * w)
        )
        v_target = jnp.where(do_change & hz_in_band, desired, v_target)

    spacing = jnp.maximum(v_target * dt, 1e-3)
    wp = path_follow_waypoints(
        spec.ego_route,
        spec.ego_route_len,
        state.pos[:, 0],
        state.heading[:, 0],
        spacing,
        num_points,
    )
    if lane_change and tmap is not None:
        # lateral shift ramps in over LC_RAMP_M of arclength (local +y =
        # road-left while aligned with the route)
        arclen = spacing[:, None] * jnp.arange(num_points, dtype=jnp.float32)
        ramp = jnp.clip(arclen / LC_RAMP_M, 0.0, 1.0)
        wp = wp.at[..., 1].add(ramp * offset[:, None])
    return wp
