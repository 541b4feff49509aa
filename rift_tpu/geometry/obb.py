"""Oriented bounding boxes: corners + separating-axis overlap tests.

Replaces the reference's shapely `Polygon` intersection + STRtree collision
checks (rift/cbv/planning/fine_tuner/rlft/traj_eval/traj_evaluator.py:241-271)
and distance3d GJK (rift/gym_carla/utils/common.py:246-262) with a vectorized
SAT test: two convex rectangles overlap iff their projections overlap on all
four face normals. Branch-free, fuses into surrounding XLA, vmappable to
all-pairs [G, N] matrices.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_corners(center: jnp.ndarray, heading: jnp.ndarray, shape: jnp.ndarray) -> jnp.ndarray:
    """Corners of oriented rectangles.

    Args:
        center: (..., 2) box centers.
        heading: (...,) yaw angles.
        shape: (..., 2) as [width, length] (reference convention,
            e.g. track_propogate.py:compute_agents_vertices_torch).

    Returns:
        (..., 4, 2) corners ordered Front-Left, Rear-Left, Rear-Right, Front-Right.
    """
    half_w = 0.5 * shape[..., 0]
    half_l = 0.5 * shape[..., 1]
    # local offsets: (dx=length axis, dy=width axis)
    dx = jnp.stack([half_l, -half_l, -half_l, half_l], axis=-1)
    dy = jnp.stack([half_w, half_w, -half_w, -half_w], axis=-1)
    c = jnp.cos(heading)[..., None]
    s = jnp.sin(heading)[..., None]
    x = dx * c - dy * s
    y = dx * s + dy * c
    return jnp.stack([x, y], axis=-1) + center[..., None, :]


def _axes_from_heading(heading: jnp.ndarray) -> jnp.ndarray:
    """(...,) -> (..., 2, 2): the two face normals of a box with given yaw."""
    c, s = jnp.cos(heading), jnp.sin(heading)
    return jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([-s, c], axis=-1)], axis=-2
    )


def obb_overlap(
    center_a: jnp.ndarray,
    heading_a: jnp.ndarray,
    shape_a: jnp.ndarray,
    center_b: jnp.ndarray,
    heading_b: jnp.ndarray,
    shape_b: jnp.ndarray,
) -> jnp.ndarray:
    """Elementwise SAT overlap of box pairs; all args broadcast. Returns bool (...,).

    shape = [width, length].
    """
    corners_a = box_corners(center_a, heading_a, shape_a)  # (..., 4, 2)
    corners_b = box_corners(center_b, heading_b, shape_b)
    axes_a = _axes_from_heading(heading_a)
    axes_b = _axes_from_heading(heading_b)
    batch = jnp.broadcast_shapes(axes_a.shape[:-2], axes_b.shape[:-2])
    axes = jnp.concatenate(
        [
            jnp.broadcast_to(axes_a, batch + (2, 2)),
            jnp.broadcast_to(axes_b, batch + (2, 2)),
        ],
        axis=-2,
    )  # (..., 4, 2)
    corners_a = jnp.broadcast_to(corners_a, batch + (4, 2))
    corners_b = jnp.broadcast_to(corners_b, batch + (4, 2))

    # project both corner sets on each axis: (..., n_axes, 4)
    pa = jnp.einsum("...kd,...cd->...kc", axes, corners_a)
    pb = jnp.einsum("...kd,...cd->...kc", axes, corners_b)
    sep = (pa.max(-1) < pb.min(-1)) | (pb.max(-1) < pa.min(-1))  # (..., n_axes)
    return ~sep.any(-1)


def obb_overlap_matrix(
    center_a: jnp.ndarray,
    heading_a: jnp.ndarray,
    shape_a: jnp.ndarray,
    center_b: jnp.ndarray,
    heading_b: jnp.ndarray,
    shape_b: jnp.ndarray,
) -> jnp.ndarray:
    """All-pairs overlap: A boxes (G, …) vs B boxes (N, …) -> (G, N) bool."""
    return obb_overlap(
        center_a[:, None],
        heading_a[:, None],
        shape_a[:, None],
        center_b[None, :],
        heading_b[None, :],
        shape_b[None, :],
    )


def point_in_obb(
    points: jnp.ndarray, center: jnp.ndarray, heading: jnp.ndarray, shape: jnp.ndarray
) -> jnp.ndarray:
    """Point-in-rectangle test, broadcasting. shape=[width, length]."""
    d = points - center
    c, s = jnp.cos(heading), jnp.sin(heading)
    lon = d[..., 0] * c + d[..., 1] * s
    lat = -d[..., 0] * s + d[..., 1] * c
    return (jnp.abs(lon) <= 0.5 * shape[..., 1]) & (jnp.abs(lat) <= 0.5 * shape[..., 0])
