"""Pallas kernel: fused point-to-lane distance query.

The hottest map op: every world tick and every feature build asks "distance
from each query point to each lane's nearest centerline vertex"
(TensorMap.lane_point_dist2). Naively that materializes an [N, L, P]
intermediate in HBM (N = scenarios x agents ~ 1.5k, L x P ~ 12k vertices ->
~70 MB per query). This kernel tiles points x lanes over the grid, expands
|p - v|^2 = |p|^2 + |v|^2 - 2 p.v with the cross term on the MXU, and
reduces min over the P vertex axis in VMEM — the [N, L, P] tensor never
exists.

Falls back to a fused-enough XLA path off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_L = 128


def _kernel(pts_ref, verts_ref, vnorm_ref, out_ref):
    # pts: [TILE_N, 2]; verts: [TILE_L * P, 2]; vnorm: [TILE_L, P]
    pts = pts_ref[:]
    verts = verts_ref[:]
    cross = jnp.dot(pts, verts.T, preferred_element_type=jnp.float32)
    # [TILE_N, TILE_L * P] -> [TILE_N, TILE_L, P]
    TLP = verts.shape[0]
    P = vnorm_ref.shape[1]
    d2 = (
        jnp.sum(pts * pts, axis=-1, keepdims=True)
        + vnorm_ref[:].reshape(1, TLP)
        - 2.0 * cross
    )
    d2 = d2.reshape(pts.shape[0], TLP // P, P)
    out_ref[:] = jnp.maximum(d2.min(axis=-1), 0.0)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_min_dist2_pallas(
    points: jnp.ndarray,  # [N, 2]
    centerline: jnp.ndarray,  # [L, P, 2]
    interpret: bool = False,
) -> jnp.ndarray:
    N = points.shape[0]
    L, P, _ = centerline.shape
    n_pad = -(-N // TILE_N) * TILE_N
    l_pad = -(-L // TILE_L) * TILE_L
    pts = _pad_to(points.astype(jnp.float32), n_pad, 0)
    verts = _pad_to(centerline.astype(jnp.float32), l_pad, 0, value=1e6)
    vnorm = jnp.sum(verts * verts, axis=-1)  # [l_pad, P]
    verts_flat = verts.reshape(l_pad * P, 2)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, l_pad), jnp.float32),
        grid=(n_pad // TILE_N, l_pad // TILE_L),
        in_specs=[
            pl.BlockSpec((TILE_N, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_L * P, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((TILE_L, P), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_L), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pts, verts_flat, vnorm)
    return out[:N, :L]


def lane_min_dist2_xla(points: jnp.ndarray, centerline: jnp.ndarray) -> jnp.ndarray:
    """MXU-expanded XLA fallback (same math, compiler-scheduled)."""
    L, P, _ = centerline.shape
    verts = centerline.reshape(L * P, 2)
    cross = points @ verts.T
    d2 = (
        jnp.sum(points * points, axis=-1, keepdims=True)
        + jnp.sum(verts * verts, axis=-1)[None]
        - 2.0 * cross
    )
    return jnp.maximum(d2.reshape(-1, L, P).min(-1), 0.0)


def lane_min_dist2(points: jnp.ndarray, centerline: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] x [L, P, 2] -> [N, L] squared distances (vertex-min)."""
    if jax.default_backend() in ("tpu", "axon"):
        return lane_min_dist2_pallas(points, centerline)
    return lane_min_dist2_xla(points, centerline)
