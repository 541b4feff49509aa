"""E2E ego policy glue: SimState -> cameras -> model -> ego_traj waypoints.

Mirrors the agent-facing surface of the reference's E2E wrappers
(rift/ego/b2d/e2e_agent.py:20-142: sensors -> model -> waypoints -> PID):
here the PID is the env's shared tracker, fed through env_step's
`ego_traj` input like PlanT (models/plant/policy.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ego.sensors import render_cameras
from ...sim.state import ScenarioSpec, SimState

TARGET_POINT_AHEAD = 30.0  # meters along the route (PlanT convention)


def e2e_inputs(spec: ScenarioSpec, state: SimState, tmap):
    """(cameras [S, CAM, H, W, C], target [S, 2] ego-frame, speed [S])."""
    imgs = render_cameras(tmap, spec, state)
    cursor = jnp.minimum(
        state.ego_route_cursor.astype(jnp.int32) + int(TARGET_POINT_AHEAD),
        spec.ego_route_len - 1,
    )
    tp_world = jnp.take_along_axis(
        spec.ego_route[..., :2], cursor[:, None, None].repeat(2, -1), axis=1
    )[:, 0]
    rel = tp_world - state.pos[:, 0]
    h = state.heading[:, 0]
    c, s = jnp.cos(-h), jnp.sin(-h)
    target = jnp.stack(
        [rel[..., 0] * c - rel[..., 1] * s, rel[..., 0] * s + rel[..., 1] * c],
        -1,
    )
    return imgs, target, state.speed[:, 0]


def e2e_ego_waypoints(
    model, params, tmap, spec: ScenarioSpec, state: SimState
) -> jnp.ndarray:
    """[S, N, 2] ego-frame waypoints for env_step's ego_traj (0.5 s
    predictions densified to the tracker's 0.1 s grid)."""
    from ...sim.pid import densify_local_waypoints

    imgs, target, speed = e2e_inputs(spec, state, tmap)
    out = model.apply(params, imgs, target, speed)
    return densify_local_waypoints(out["pred_wp"], wp_dt=0.5)
