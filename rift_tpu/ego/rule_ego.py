"""Rule-based ego: privileged route following with IDM speed control.

Stand-in for the reference's PDM-Lite expert (rift/ego/pdm_lite/autopilot.py:
IDM target speed from forecasted leading vehicles + privileged route planner
+ lateral/longitudinal PID). The kinematic forecasting reduces to the leader
gap/speed terms of IDM here; full multi-step forecast collision checks land
with the PDM-Lite port. Vectorized over scenarios; emits local waypoints for
the world tick's trajectory-tracking interface.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sim.autopilot import (
    LeaderInfo,
    find_leaders,
    idm_target_speed,
    path_follow_waypoints,
)
from ..sim.state import ScenarioSpec, SimState

EGO_SPEED_DEFAULT = 8.0  # m/s cruise if the spec has none


def rule_ego_waypoints(
    spec: ScenarioSpec,
    state: SimState,
    dt: float = 0.1,
    num_points: int = 30,
    tmap=None,
) -> jnp.ndarray:
    """[S, N, 2] local-frame waypoints for agent slot 0 of each scenario."""
    leaders = find_leaders(
        state.pos, state.heading, state.speed, state.shape, state.alive
    )
    ego_leaders = LeaderInfo(gap=leaders.gap[:, 0], speed=leaders.speed[:, 0])
    v0 = jnp.where(
        spec.ego_target_speed > 0, spec.ego_target_speed, EGO_SPEED_DEFAULT
    )
    v_target = idm_target_speed(state.speed[:, 0], v0, ego_leaders, dt)
    if tmap is not None:
        from ..sim.stop_signs import stop_target_speed
        from ..sim.traffic_lights import red_ahead

        must_stop, _ = red_ahead(
            tmap, state.lane[:, :1], state.pos[:, :1], state.tick
        )
        v_target = jnp.where(must_stop[:, 0], 0.0, v_target)
        # junction negotiation: wait for cross traffic in the box before
        # entering (PDM-Lite gets this from its forecast sweep,
        # autopilot.py:906-1051; the rule ego uses the TM-style yield)
        from ..sim.autopilot import yield_target_speed

        v_all = jnp.broadcast_to(
            v_target[:, None], state.speed.shape
        )
        v_target = yield_target_speed(tmap, state, v_all)[:, 0]
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
