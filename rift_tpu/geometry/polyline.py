"""Polyline kernels: arclength, resampling, projection.

On-device replacements for shapely `LineString.project/distance` and the
reference's per-lane 20-point resampling (rift/cbv/planning/pluto/utils/
nuplan_map_utils.py:292-308) and trajectory interpolation
(nuplan_plugin/path/, trajectory/). Fixed-size, mask-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .se2 import wrap_angle


def polyline_arclength(points: jnp.ndarray) -> jnp.ndarray:
    """Cumulative arclength. (..., P, 2) -> (..., P), starting at 0."""
    seg = jnp.linalg.norm(jnp.diff(points, axis=-2), axis=-1)
    return jnp.concatenate(
        [jnp.zeros_like(seg[..., :1]), jnp.cumsum(seg, axis=-1)], axis=-1
    )


def resample_polyline(points: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Resample a (P, 2) polyline to `num_samples` equally-spaced-by-arclength
    points (endpoints preserved). Zero-length polylines repeat the first point."""
    s = polyline_arclength(points)
    total = jnp.maximum(s[-1], 1e-9)
    targets = jnp.linspace(0.0, 1.0, num_samples) * total
    x = jnp.interp(targets, s, points[:, 0])
    y = jnp.interp(targets, s, points[:, 1])
    return jnp.stack([x, y], axis=-1)


def polyline_headings(points: jnp.ndarray) -> jnp.ndarray:
    """Per-point tangent heading of (..., P, 2) polylines -> (..., P).

    Uses forward differences; last point repeats the previous heading.
    """
    vec = jnp.diff(points, axis=-2)
    h = jnp.arctan2(vec[..., 1], vec[..., 0])
    return jnp.concatenate([h, h[..., -1:]], axis=-1)


def nearest_point_index(
    polyline: jnp.ndarray, query: jnp.ndarray, valid_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Index of the closest polyline vertex to each query point.

    Args:
        polyline: (..., P, 2)
        query: (..., 2)
        valid_mask: optional (..., P) bool; invalid vertices are ignored.
    Returns:
        (...,) int32 indices.
    """
    d2 = jnp.sum((polyline - query[..., None, :]) ** 2, axis=-1)
    if valid_mask is not None:
        d2 = jnp.where(valid_mask, d2, jnp.inf)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def project_point_to_polyline(
    polyline: jnp.ndarray, query: jnp.ndarray, valid_mask: jnp.ndarray | None = None
):
    """Project points onto segment-wise polylines.

    Args:
        polyline: (..., P, 2)
        query: (..., 2)
        valid_mask: optional (..., P) vertex validity.

    Returns:
        (arclength, signed_lateral, heading_at_projection), each (...,).
        signed lateral follows the reference's convention of
        traj_evaluator.py:417-418: positive to the right of the tangent
        (delta_dis = -cross(rel, tangent) there; we return the same sign).
    """
    a = polyline[..., :-1, :]  # (..., P-1, 2) segment starts
    b = polyline[..., 1:, :]
    ab = b - a
    ab_len2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.sum((query[..., None, :] - a) * ab, axis=-1) / ab_len2
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab  # (..., P-1, 2)
    d2 = jnp.sum((query[..., None, :] - proj) ** 2, axis=-1)
    if valid_mask is not None:
        seg_valid = valid_mask[..., :-1] & valid_mask[..., 1:]
        d2 = jnp.where(seg_valid, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)

    seg_len = jnp.linalg.norm(ab, axis=-1)
    cum = jnp.concatenate(
        [jnp.zeros_like(seg_len[..., :1]), jnp.cumsum(seg_len, axis=-1)], axis=-1
    )
    t_best = jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]
    s0 = jnp.take_along_axis(cum[..., :-1], idx[..., None], axis=-1)[..., 0]
    l0 = jnp.take_along_axis(seg_len, idx[..., None], axis=-1)[..., 0]
    arclength = s0 + t_best * l0

    tangent = jnp.take_along_axis(
        ab, idx[..., None, None].repeat(2, axis=-1), axis=-2
    )[..., 0, :]
    heading = jnp.arctan2(tangent[..., 1], tangent[..., 0])
    proj_best = jnp.take_along_axis(
        proj, idx[..., None, None].repeat(2, axis=-1), axis=-2
    )[..., 0, :]
    rel = query - proj_best
    tdir = jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=-1)
    signed_lat = -(rel[..., 0] * tdir[..., 1] - rel[..., 1] * tdir[..., 0])
    return arclength, signed_lat, wrap_angle(heading)
