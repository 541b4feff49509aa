"""Synthetic multi-camera sensor bridge for the E2E AV stacks.

The reference's E2E egos (UniAD / VAD / SparseDrive) consume a six-camera
surround rig rendered by UE4 (rift/ego/b2d/e2e_agent.py:20-142 attaches
real camera sensors via AgentWrapper). The kinematic TPU tick has no
photoreal renderer, so this module provides the documented stand-in
(SURVEY.md §7 stage 9): the same [cam, H, W, C] interface, rendered
on-device from privileged SimState as *semantic* cameras — each ground
pixel is ray-cast from the pinhole rig to the z=0 plane and labelled with
drivable / route / vehicle / walker / static occupancy plus inverse
depth. Everything is jnp and shape-static, so rendering fuses into the
same jitted step as the policy forward (no host round-trip, unlike the
reference's sensor-queue path).

Also exports the inverse mapping `project_points` (ego-frame points ->
normalized per-camera image coordinates) used by the BEV and sparse
perception heads to anchor deformable-attention sampling locations
(ops/e2e.py: ms_deform_attn / deformable_aggregation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.state import CLASS_STATIC, CLASS_VEHICLE, CLASS_WALKER

# --- rig geometry (Bench2Drive six-camera surround layout) -------------------
# yaw (deg, ccw from vehicle forward), horizontal FOV (deg)
CAMERA_YAWS_DEG = (0.0, 55.0, -55.0, 180.0, 110.0, -110.0)
CAMERA_FOVS_DEG = (70.0, 70.0, 70.0, 110.0, 70.0, 70.0)
NUM_CAMERAS = len(CAMERA_YAWS_DEG)
CAM_HEIGHT = 1.6  # meters above ground
CAM_FORWARD = 0.8  # meters ahead of the box center
IMG_H, IMG_W = 24, 48
MAX_RANGE = 64.0  # ground-hit clip (meters)
ROUTE_WINDOW = 64  # route waypoints sampled around the cursor
ROUTE_HALF_WIDTH = 2.5  # meters: pixel counts as on-route within this

# channel layout
CH_VALID = 0  # ground hit inside range
CH_DRIVABLE = 1
CH_ROUTE = 2
CH_VEHICLE = 3
CH_WALKER = 4
CH_STATIC = 5
CH_RED_LIGHT = 6  # ego red-light hazard, broadcast on the front camera
CH_INV_DEPTH = 7
NUM_CHANNELS = 8


def _rig_rays(h: int = IMG_H, w: int = IMG_W):
    """Static per-camera pixel ray table [N_CAM, h, w, 3]: unit-free
    direction (forward, left, down) in the CAMERA frame, z-forward
    pinhole with square pixels sized by the horizontal FOV."""
    rays = []
    for fov in CAMERA_FOVS_DEG:
        fx = (w / 2.0) / np.tan(np.radians(fov) / 2.0)
        u = (np.arange(w) - w / 2.0 + 0.5) / fx  # right +
        v = (np.arange(h) - h / 2.0 + 0.5) / fx  # down +
        vv, uu = np.meshgrid(v, u, indexing="ij")
        rays.append(np.stack([np.ones_like(uu), -uu, vv], axis=-1))
    return jnp.asarray(np.stack(rays), jnp.float32)  # (fwd, left, down)


_RAYS = None


def _rays():
    global _RAYS
    if _RAYS is None:
        _RAYS = _rig_rays()
    return _RAYS


def _cam_poses(ego_pos, ego_heading):
    """World (x, y) and yaw of each camera. [.., N_CAM, 2], [.., N_CAM]."""
    yaws = jnp.asarray(np.radians(CAMERA_YAWS_DEG), jnp.float32)
    c, s = jnp.cos(ego_heading), jnp.sin(ego_heading)
    fwd = jnp.stack([c, s], -1)
    xy = ego_pos + CAM_FORWARD * fwd
    return (
        jnp.broadcast_to(xy[..., None, :], ego_pos.shape[:-1] + (NUM_CAMERAS, 2)),
        ego_heading[..., None] + yaws,
    )


def _ground_points(ego_pos, ego_heading):
    """Ray-cast every pixel to z=0: world points [N_CAM, h, w, 2], hit
    mask and range t (clipped)."""
    rays = _rays()  # [N_CAM, h, w, 3] (fwd, left, down)
    cam_xy, cam_yaw = _cam_poses(ego_pos, ego_heading)  # [N_CAM, 2], [N_CAM]

    down = rays[..., 2]
    hit = down > 1e-4  # below the horizon
    t = jnp.where(hit, CAM_HEIGHT / jnp.maximum(down, 1e-4), MAX_RANGE)
    hit = hit & (t <= MAX_RANGE)
    t = jnp.minimum(t, MAX_RANGE)

    c = jnp.cos(cam_yaw)[:, None, None]
    s = jnp.sin(cam_yaw)[:, None, None]
    fwd, left = rays[..., 0], rays[..., 1]
    dx = fwd * c - left * s
    dy = fwd * s + left * c
    pts = cam_xy[:, None, None, :] + t[..., None] * jnp.stack([dx, dy], -1)
    return pts, hit, t


def _point_in_obb(pts, pos, heading, shape):
    """pts [..., 2] vs boxes pos/heading/shape [A, ...]: [..., A] bool."""
    rel = pts[..., None, :] - pos  # [..., A, 2]
    c, s = jnp.cos(heading), jnp.sin(heading)
    lx = rel[..., 0] * c + rel[..., 1] * s  # longitudinal
    ly = -rel[..., 0] * s + rel[..., 1] * c  # lateral
    half_l = shape[..., 1] * 0.5
    half_w = shape[..., 0] * 0.5
    return (jnp.abs(lx) <= half_l) & (jnp.abs(ly) <= half_w)


def render_cameras(tmap, spec, state) -> jnp.ndarray:
    """SimState -> semantic surround cameras [S, N_CAM, H, W, C].

    Stand-in for the UE4 camera sensors of the reference's E2E agents
    (e2e_agent.py sensors list); channels documented at module top.
    """
    from ..sim.traffic_lights import red_ahead

    S, A = state.alive.shape

    def one(pos_a, heading_a, shape_a, alive_a, cls_a, route, route_len,
            cursor, red, vis):
        ego_pos, ego_heading = pos_a[0], heading_a[0]
        pts, hit, t = _ground_points(ego_pos, ego_heading)
        # weather: fog/rain shorten the usable sensing range (the UE4 rig
        # physically sees less; Weather.visibility in scenario/routes.py)
        hit = hit & (t <= MAX_RANGE * vis)

        drivable = tmap.on_road_raster(pts.reshape(-1, 2)).reshape(pts.shape[:-1])

        # route channel: distance to a cursor-centred window of waypoints
        start = jnp.clip(cursor.astype(jnp.int32) - 8, 0,
                         jnp.maximum(route_len - ROUTE_WINDOW, 0))
        idx = start + jnp.arange(ROUTE_WINDOW)
        wp = route[jnp.minimum(idx, route.shape[0] - 1), :2]  # [RW, 2]
        wp_valid = idx < route_len
        d2 = jnp.sum((pts[..., None, :] - wp) ** 2, -1)
        d2 = jnp.where(wp_valid, d2, jnp.inf)
        on_route = jnp.min(d2, -1) <= ROUTE_HALF_WIDTH ** 2

        occ = _point_in_obb(pts, pos_a, heading_a, shape_a)  # [.., A]
        others = alive_a & (jnp.arange(A) != 0)
        veh = (occ & others & (cls_a == CLASS_VEHICLE)).any(-1)
        wlk = (occ & others & (cls_a == CLASS_WALKER)).any(-1)
        stc = (occ & others & (cls_a == CLASS_STATIC)).any(-1)

        f = jnp.float32
        inv_depth = jnp.where(hit, 1.0 / jnp.maximum(t, 1.0), 0.0)
        front = (jnp.arange(NUM_CAMERAS) == 0).astype(f)[:, None, None]
        chans = [
            hit.astype(f),
            (drivable & hit).astype(f),
            (on_route & hit).astype(f),
            (veh & hit).astype(f),
            (wlk & hit).astype(f),
            (stc & hit).astype(f),
            jnp.broadcast_to(red.astype(f) * front, hit.shape),
            inv_depth,
        ]
        return jnp.stack(chans, -1)

    red, _ = red_ahead(tmap, state.lane[:, :1], state.pos[:, :1], state.tick)
    red = red[:, 0]
    vis = (
        spec.visibility
        if spec.visibility is not None
        else jnp.ones(S, jnp.float32)
    )
    return jax.vmap(one)(
        state.pos, state.heading, state.shape, state.alive,
        state.agent_class, spec.ego_route, spec.ego_route_len,
        state.ego_route_cursor, red, vis,
    )


# ---------------------------------------------------------------------------
# inverse mapping: ego-frame points -> per-camera normalized image coords
# ---------------------------------------------------------------------------
def pixel_ground_table():
    """Static per-pixel EGO-frame ground intersections: ([N_CAM, H, W, 2]
    points, [N_CAM, H, W] hit mask). The rig is fixed in the ego frame and
    the ground is the z=0 plane, so pixel->ground geometry is
    state-independent — only each pixel's semantic content varies. Used by
    the E2E models' pillar-splat BEV priors (models/e2e/model.py), which
    lift camera pixels into BEV cells (ops/e2e.py voxelize /
    dynamic_scatter_mean — the reference's mmcv Voxelization /
    DynamicScatter ops)."""
    pts, hit, _ = _ground_points(
        jnp.zeros(2, jnp.float32), jnp.zeros((), jnp.float32)
    )
    return pts, hit


def project_points(pts_ego: jnp.ndarray, z: float = 0.0):
    """Ego-frame ground points [..., 2] -> (uv [..., N_CAM, 2] in [0, 1],
    in_view [..., N_CAM] bool). The rig is fixed in the ego frame, so this
    is state-independent — BEV-grid projections fold to constants under
    jit (the anchors of ms_deform_attn / deformable_aggregation sampling).
    """
    yaws = jnp.asarray(np.radians(CAMERA_YAWS_DEG), jnp.float32)
    fovs = jnp.asarray(np.radians(CAMERA_FOVS_DEG), jnp.float32)
    fx = (IMG_W / 2.0) / jnp.tan(fovs / 2.0)

    rel = pts_ego[..., None, :] - jnp.asarray([CAM_FORWARD, 0.0])
    c, s = jnp.cos(yaws), jnp.sin(yaws)
    fwd = rel[..., 0] * c + rel[..., 1] * s
    left = -rel[..., 0] * s + rel[..., 1] * c
    down = jnp.full_like(fwd, CAM_HEIGHT - z)

    safe_fwd = jnp.maximum(fwd, 0.1)
    u = (-left / safe_fwd) * fx + IMG_W / 2.0 - 0.5
    v = (down / safe_fwd) * fx + IMG_H / 2.0 - 0.5
    uv = jnp.stack([(u + 0.5) / IMG_W, (v + 0.5) / IMG_H], -1)
    in_view = (
        (fwd > 0.2)
        & (uv[..., 0] > 0.0) & (uv[..., 0] < 1.0)
        & (uv[..., 1] > 0.0) & (uv[..., 1] < 1.0)
    )
    return uv, in_view
