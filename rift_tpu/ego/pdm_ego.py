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


@partial(jax.jit, static_argnames=("dt", "num_points"))
def pdm_ego_waypoints(
    spec: ScenarioSpec,
    state: SimState,
    tmap=None,
    dt: float = 0.1,
    num_points: int = 30,
) -> jnp.ndarray:
    """[S, N, 2] local-frame waypoints for agent slot 0."""
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

    spacing = jnp.maximum(v_target * dt, 1e-3)
    return path_follow_waypoints(
        spec.ego_route,
        spec.ego_route_len,
        state.pos[:, 0],
        state.heading[:, 0],
        spacing,
        num_points,
    )
