"""PlanT ego policy: SimState -> object tokens -> waypoints.

Token construction mirrors the reference's data_agent_boxes pipeline
(rift/ego/plant/data_agent_boxes.py + plant_agent.py:29-220): vehicles within
a detection radius become type-1 tokens with [x, y, yaw, speed, extent_x,
extent_y] in the ego frame; upcoming route segments become type-2 tokens with
segment id in the speed slot. The predicted waypoints feed the world tick's
trajectory interface directly (the reference runs its own PID on them —
here the shared tracker does, pid.track_step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...geometry.se2 import wrap_angle
from ...sim.state import ScenarioSpec, SimState

MAX_VEHICLE_TOKENS = 16
NUM_ROUTE_TOKENS = 2
ROUTE_SEG_LEN = 10.0  # meters per route token
DETECTION_RADIUS = 30.0
TARGET_POINT_AHEAD = 30.0


def build_plant_tokens(
    spec: ScenarioSpec, state: SimState, return_vehicle_index: bool = False
):
    """Returns (tokens [S, O, 7], target_point [S, 2], light_hazard [S, 1])
    and, with `return_vehicle_index`, the agent slot behind each vehicle
    token [S, MAX_VEHICLE_TOKENS] (-1 for padding) — the recognition scorer
    scatters attention back through it."""
    S, A = state.alive.shape

    def one(scenario):
        ego_pos = state.pos[scenario, 0]
        ego_heading = state.heading[scenario, 0]
        c, sn = jnp.cos(-ego_heading), jnp.sin(-ego_heading)

        def to_local(p):
            rel = p - ego_pos
            return jnp.stack(
                [rel[..., 0] * c - rel[..., 1] * sn, rel[..., 0] * sn + rel[..., 1] * c],
                axis=-1,
            )

        # vehicle tokens
        d = jnp.linalg.norm(state.pos[scenario] - ego_pos, axis=-1)
        d = jnp.where(
            state.alive[scenario] & (jnp.arange(A) != 0), d, jnp.inf
        )
        k = min(MAX_VEHICLE_TOKENS, A)
        neg, idx = jax.lax.top_k(-d, k)
        valid = jnp.isfinite(-neg) & (-neg > -DETECTION_RADIUS)
        local = to_local(state.pos[scenario][idx])
        veh = jnp.concatenate(
            [
                jnp.where(valid, 1.0, 0.0)[:, None],  # type
                local,
                wrap_angle(state.heading[scenario][idx] - ego_heading)[:, None],
                state.speed[scenario][idx][:, None],
                state.shape[scenario][idx][:, 1:2] * 0.5,  # extent_x
                state.shape[scenario][idx][:, 0:1] * 0.5,  # extent_y
            ],
            axis=-1,
        )
        veh = jnp.where(valid[:, None], veh, 0.0)
        if k < MAX_VEHICLE_TOKENS:
            veh = jnp.pad(veh, ((0, MAX_VEHICLE_TOKENS - k), (0, 0)))

        # route tokens: segments ahead of the ego's route projection
        route = spec.ego_route[scenario, :, :2]
        n = spec.ego_route_len[scenario]
        cursor = state.ego_route_cursor[scenario].astype(jnp.int32)
        segs = []
        for i in range(NUM_ROUTE_TOKENS):
            s0 = jnp.minimum(cursor + jnp.int32(i * ROUTE_SEG_LEN), n - 2)
            s1 = jnp.minimum(s0 + jnp.int32(ROUTE_SEG_LEN), n - 1)
            p0, p1 = to_local(route[s0]), to_local(route[s1])
            mid = 0.5 * (p0 + p1)
            vec = p1 - p0
            yaw = jnp.arctan2(vec[1], vec[0])
            length = jnp.linalg.norm(vec)
            segs.append(
                jnp.concatenate(
                    [
                        jnp.array([2.0]),
                        mid,
                        yaw[None],
                        jnp.array([float(i)]),  # id in the speed slot
                        length[None] * 0.5,
                        jnp.array([1.0]),
                    ]
                )
            )
        route_tokens = jnp.stack(segs)
        tokens = jnp.concatenate([veh, route_tokens], axis=0)

        tp_idx = jnp.minimum(cursor + jnp.int32(TARGET_POINT_AHEAD), n - 1)
        target_point = to_local(route[tp_idx])
        vid = jnp.where(valid, idx, -1)
        if k < MAX_VEHICLE_TOKENS:
            vid = jnp.pad(vid, (0, MAX_VEHICLE_TOKENS - k), constant_values=-1)
        return tokens, target_point, vid

    tokens, target, vid = jax.vmap(one)(jnp.arange(S))
    light = jnp.zeros((S, 1))  # all-green assumption, like the CBV features
    if return_vehicle_index:
        return tokens, target, light, vid
    return tokens, target, light


@partial(jax.jit, static_argnames=("model",))
def plant_ego_waypoints(
    model, params, spec: ScenarioSpec, state: SimState
) -> jnp.ndarray:
    """[S, N, 2] local waypoints for the env's ego_traj interface."""
    from ...sim.pid import densify_local_waypoints

    tokens, target, light = build_plant_tokens(spec, state)
    out = model.apply(params, tokens, target, light)
    # undo the lidar shift so waypoints are in the vehicle frame
    wp = out["pred_wp"].at[..., 0].add(1.3)
    # 0.5 s-spaced predictions -> the tracker's 0.1 s grid (train.py
    # WAYPOINT_STRIDE labels; padding with the last point read as "stop")
    return densify_local_waypoints(wp, wp_dt=0.5)
