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

    Closed-form rectangle SAT: boxes are separated along axis u iff
    |(c_b - c_a).u| > h_a(u) + h_b(u), where a box's half-extent on u is
    h(u) = (l/2)|f.u| + (w/2)|s.u| with f/s its length/width axes. Pure
    elementwise math — no corner tensors, no per-pair dot_generals (a tiny
    einsum over millions of pairs gets tile-padded on the MXU and blows
    HBM; this formulation stays on the VPU at O(1) memory per pair).
    """
    ca, sa = jnp.cos(heading_a), jnp.sin(heading_a)
    cb, sb = jnp.cos(heading_b), jnp.sin(heading_b)
    hw_a, hl_a = 0.5 * shape_a[..., 0], 0.5 * shape_a[..., 1]
    hw_b, hl_b = 0.5 * shape_b[..., 0], 0.5 * shape_b[..., 1]
    tx = center_b[..., 0] - center_a[..., 0]
    ty = center_b[..., 1] - center_a[..., 1]

    def half_extent(ux, uy, c, s, hl, hw):
        # f = (c, s), side = (-s, c)
        return hl * jnp.abs(ux * c + uy * s) + hw * jnp.abs(-ux * s + uy * c)

    sep = None
    # the four face normals: f_a, s_a, f_b, s_b
    for ux, uy in ((ca, sa), (-sa, ca), (cb, sb), (-sb, cb)):
        dist = jnp.abs(tx * ux + ty * uy)
        ha = half_extent(ux, uy, ca, sa, hl_a, hw_a)
        hb = half_extent(ux, uy, cb, sb, hl_b, hw_b)
        s_k = dist > ha + hb
        sep = s_k if sep is None else (sep | s_k)
    return ~sep


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
