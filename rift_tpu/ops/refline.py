"""Pallas kernel: candidate-vs-reference-line distance/angle matrices.

Step 1 of the GRPO evaluator (rl/evaluator.py:ref_line_matrices; reference
traj_evaluator.py:372-420 get_ref_line_info): for every candidate trajectory
point, find the nearest point of its own reference line and emit the signed
lateral offset and heading error. Batched over all (CBV, reference-line)
pairs the XLA formulation materializes a [B, R, M, T, Nr] float32 distance
tensor (~1.8 GB at 192 CBVs) plus its argmin and two gathers — several full
HBM passes.

Here each (CBV, ref-line) pair's [M*T, Nr] distance block lives only in
VMEM: distances, first-argmin, the one-hot angle/position gathers and the
cross-product lateral sign all fuse into one kernel pass. HBM traffic drops
to the inputs and the two [B*R, M*T] outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .retrack import _atan2

BB = 8  # (CBV, ref-line) pairs per block


def _refline_kernel(cx_ref, cy_ref, ch_ref, rx_ref, ry_ref, rc_ref, rs_ref,
                    rv_ref, dis_ref, ang_ref):
    cx = cx_ref[:]  # [BB, MT]
    cy = cy_ref[:]
    ch = ch_ref[:]
    rx = rx_ref[:]  # [BB, Nr]
    ry = ry_ref[:]
    rcos = rc_ref[:]
    rsin = rs_ref[:]
    rvalid = rv_ref[:]  # [BB, Nr] float32 (1 valid / 0 pad)
    Nr = rx.shape[-1]

    dxx = cx[:, :, None] - rx[:, None, :]  # [BB, MT, Nr]
    dyy = cy[:, :, None] - ry[:, None, :]
    d2 = dxx * dxx + dyy * dyy
    d2 = jnp.where(rvalid[:, None, :] > 0.5, d2, jnp.inf)

    mn = jnp.min(d2, axis=-1, keepdims=True)  # [BB, MT, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    idx = jnp.min(jnp.where(d2 == mn, iota, Nr), axis=-1)  # first argmin
    one_hot = (iota == idx[..., None]).astype(jnp.float32)

    g = lambda v: jnp.sum(one_hot * v[:, None, :], axis=-1)  # [BB, MT]
    tan_c = g(rcos)
    tan_s = g(rsin)
    rel_x = cx - g(rx)
    rel_y = cy - g(ry)

    # signed lateral: -(rel x tangent)
    cross = rel_x * tan_s - rel_y * tan_c
    dis_ref[:] = -cross
    # heading error, wrapped
    closest_angle = _atan2(tan_s, tan_c)  # Mosaic has no atan2 lowering
    raw = ch - closest_angle
    ang_ref[:] = (raw + jnp.pi) % (2 * jnp.pi) - jnp.pi


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def refline_matrices_pallas(
    cand_pos: jnp.ndarray,  # [BR, MT, 2]
    cand_heading: jnp.ndarray,  # [BR, MT]
    ref_pos: jnp.ndarray,  # [BR, Nr, 2]
    ref_heading: jnp.ndarray,  # [BR, Nr]
    ref_valid: jnp.ndarray,  # [BR, Nr] bool
    interpret: bool = False,
):
    """Returns (delta_dis signed, delta_angle) each [BR, MT]."""
    BR, MT, _ = cand_pos.shape
    Nr = ref_pos.shape[1]
    BRp = _round_up(BR, BB)

    def padb(x):
        return jnp.pad(x, ((0, BRp - BR),) + ((0, 0),) * (x.ndim - 1))

    cx = padb(cand_pos[..., 0].astype(jnp.float32))
    cy = padb(cand_pos[..., 1].astype(jnp.float32))
    ch = padb(cand_heading.astype(jnp.float32))
    rx = padb(ref_pos[..., 0].astype(jnp.float32))
    ry = padb(ref_pos[..., 1].astype(jnp.float32))
    rc = padb(jnp.cos(ref_heading).astype(jnp.float32))
    rs = padb(jnp.sin(ref_heading).astype(jnp.float32))
    rv = padb(ref_valid.astype(jnp.float32))

    c_spec = pl.BlockSpec((BB, MT), lambda i: (i, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((BB, Nr), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dis, ang = pl.pallas_call(
        _refline_kernel,
        out_shape=[jax.ShapeDtypeStruct((BRp, MT), jnp.float32)] * 2,
        grid=(BRp // BB,),
        in_specs=[c_spec, c_spec, c_spec, r_spec, r_spec, r_spec, r_spec, r_spec],
        out_specs=[c_spec, c_spec],
        interpret=interpret,
    )(cx, cy, ch, rx, ry, rc, rs, rv)
    return dis[:BR], ang[:BR]
