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

# (CBV, ref-line) pairs per block — Mosaic requires the sublane block dim
# divisible by 8, so BB=8 is the floor. The [BB, MT=480, Nr=120] f32
# intermediates at ~10 live tensors total ~18 MB, past the 16 MB VMEM
# ceiling (measured 3.5 ms/tick in-context as HBM spill); the kernel
# therefore streams the candidate-point axis in MT_CHUNK slices, keeping
# the working set ~2.5 MB VMEM-resident.
BB = 8
MT_CHUNK = 128


def _refline_kernel(cx_ref, cy_ref, ch_ref, rx_ref, ry_ref, rc_ref, rs_ref,
                    rv_ref, dis_ref, ang_ref):
    rx = rx_ref[:]  # [BB, Nr]
    ry = ry_ref[:]
    rcos = rc_ref[:]
    rsin = rs_ref[:]
    rvalid = rv_ref[:]  # [BB, Nr] float32 (1 valid / 0 pad)
    Nr = rx.shape[-1]
    MT = cx_ref.shape[-1]
    n_chunks = MT // MT_CHUNK  # MT padded to a multiple by the caller

    def chunk(ci, _):
        sl = pl.ds(ci * MT_CHUNK, MT_CHUNK)
        cx = cx_ref[:, sl]  # [BB, MC]
        cy = cy_ref[:, sl]
        ch = ch_ref[:, sl]

        dxx = cx[:, :, None] - rx[:, None, :]  # [BB, MC, Nr]
        dyy = cy[:, :, None] - ry[:, None, :]
        d2 = dxx * dxx + dyy * dyy
        d2 = jnp.where(rvalid[:, None, :] > 0.5, d2, jnp.inf)

        mn = jnp.min(d2, axis=-1, keepdims=True)  # [BB, MC, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        idx = jnp.min(jnp.where(d2 == mn, iota, Nr), axis=-1)  # first argmin
        one_hot = (iota == idx[..., None]).astype(jnp.float32)

        g = lambda v: jnp.sum(one_hot * v[:, None, :], axis=-1)  # [BB, MC]
        tan_c = g(rcos)
        tan_s = g(rsin)
        rel_x = cx - g(rx)
        rel_y = cy - g(ry)

        # signed lateral: -(rel x tangent)
        cross = rel_x * tan_s - rel_y * tan_c
        dis_ref[:, sl] = -cross
        # heading error, wrapped
        closest_angle = _atan2(tan_s, tan_c)  # Mosaic has no atan2 lowering
        raw = ch - closest_angle
        ang_ref[:, sl] = (raw + jnp.pi) % (2 * jnp.pi) - jnp.pi
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


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
    MTp = _round_up(MT, MT_CHUNK)

    def padb(x):
        return jnp.pad(x, ((0, BRp - BR),) + ((0, 0),) * (x.ndim - 1))

    def padmt(x):
        return jnp.pad(x, ((0, 0), (0, MTp - MT)))

    cx = padmt(padb(cand_pos[..., 0].astype(jnp.float32)))
    cy = padmt(padb(cand_pos[..., 1].astype(jnp.float32)))
    ch = padmt(padb(cand_heading.astype(jnp.float32)))
    rx = padb(ref_pos[..., 0].astype(jnp.float32))
    ry = padb(ref_pos[..., 1].astype(jnp.float32))
    rc = padb(jnp.cos(ref_heading).astype(jnp.float32))
    rs = padb(jnp.sin(ref_heading).astype(jnp.float32))
    rv = padb(ref_valid.astype(jnp.float32))

    c_spec = pl.BlockSpec((BB, MTp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((BB, Nr), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dis, ang = pl.pallas_call(
        _refline_kernel,
        out_shape=[jax.ShapeDtypeStruct((BRp, MTp), jnp.float32)] * 2,
        grid=(BRp // BB,),
        in_specs=[c_spec, c_spec, c_spec, r_spec, r_spec, r_spec, r_spec, r_spec],
        out_specs=[c_spec, c_spec],
        interpret=interpret,
    )(cx, cy, ch, rx, ry, rc, rs, rv)
    return dis[:BR, :MT], ang[:BR, :MT]
