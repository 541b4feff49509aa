"""Pallas kernel: fused masked-PointNet (PointsEncoder) forward.

The Pluto map encoder runs a PointsEncoder over B*M = up to 12k polygon
rows x P~21 points (models/pluto/layers.py:PointsEncoder, the reference's
layers/embedding.py:PointsEncoder) and again over the reference lines —
per tick. The XLA path materialises every intermediate ([N, P, 256] and a
[N, P, 512] concat) in HBM: ~0.5 GB of layout-padded traffic per call at
eval batch sizes, all of it bandwidth-bound.

This kernel keeps one row-block's whole pipeline in VMEM:

    h1 = relu(LN(x @ w1 + b1))            [bb, P, 128]
    h2 = h1 @ w2 + b2, masked             [bb, P, 256]
    pooled = max_P(h2)                    [bb, 1, 256]
    cat-matmul trick: (h2 ++ pooled) @ w3 = h2 @ w3a + pooled @ w3b
    h3 = relu(LN(...))                    [bb, P, 256]
    h4 = h3 @ w4 + b4, masked             [bb, P, out]
    out = max_P(h4), zeroed where no point is valid

Only the [N, P, C] input, the [N, P] mask and the [N, out] output touch
HBM. `has_ln=False` matches the converted-torch-weights variant (BatchNorm
folded into the Linears, convert.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


# Rows per pallas_call. XLA's memory-space-assignment pass may scope the
# custom call's *whole output* in VMEM when a fused consumer follows (seen
# live: the fit path at N=16384 put the f32[16384,128] output on the VMEM
# stack -> 8.4 MB on top of the kernel's own live set -> 19.7 MB > 16 MB
# scoped limit). Chunking the call through lax.map bounds any such scoped
# output to CHUNK*out_dim*4 bytes (2 MB at out_dim=128); the grid inside a
# pallas_call is sequential on TPU anyway, so the chunk loop adds nothing.
_CHUNK_ROWS = 4096
# BB*P budget for the kernel's internal live set. Mosaic schedules ~4 live
# [BB, P, 256] f32 buffers; 4 * BB * P * 256 * 4B <= ~6 MB -> BB*P <= 1440,
# leaving headroom for a scoped output chunk + weights within the 16 MB.
_BB_P_BUDGET = 1440


def _block_rows(P: int) -> int:
    """Rows per grid block, sized for the 16 MB VMEM scoped limit."""
    return max(8, min(256, (_BB_P_BUDGET // max(P, 1)) // 8 * 8))


def fits_vmem(P: int) -> bool:
    """False when even BB=8 rows of P points exceed the VMEM budget —
    callers must use points_forward_xla (ADVICE r2: fail loudly, don't
    let Mosaic OOM on a future large-P call site)."""
    return 8 * P <= _BB_P_BUDGET


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, k):
    return jax.lax.dot_general(
        a, k, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _points_kernel(
    x_ref, mask_ref,
    w1_ref, b1_ref, ln1s_ref, ln1b_ref,
    w2_ref, b2_ref,
    w3a_ref, w3b_ref, b3_ref, ln2s_ref, ln2b_ref,
    w4_ref, b4_ref,
    out_ref,
    *, has_ln: bool,
):
    x = x_ref[:]  # [bb, P, C] f32
    mask = mask_ref[:]  # [bb, P] f32 (1 valid / 0 pad)
    m = mask[..., None]

    h = _dot(x, w1_ref[:]) + b1_ref[:]
    if has_ln:
        h = _ln(h, ln1s_ref[:], ln1b_ref[:])
    h = jnp.maximum(h, 0.0)
    h = _dot(h, w2_ref[:]) + b2_ref[:]
    h = jnp.where(m > 0.5, h, NEG)
    pooled = jnp.max(h, axis=1, keepdims=True)  # [bb, 1, 256]

    # (h ++ pooled) @ w3 without materialising the concat
    h = _dot(h, w3a_ref[:]) + _dot(pooled, w3b_ref[:]) + b3_ref[:]
    if has_ln:
        h = _ln(h, ln2s_ref[:], ln2b_ref[:])
    h = jnp.maximum(h, 0.0)
    h = _dot(h, w4_ref[:]) + b4_ref[:]
    h = jnp.where(m > 0.5, h, NEG)
    out = jnp.max(h, axis=1)  # [bb, out]

    any_valid = jnp.max(mask, axis=1, keepdims=True)  # [bb, 1]
    out_ref[:] = jnp.where(any_valid > 0.5, out, 0.0)


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(
    jax.jit, static_argnames=("out_dim", "has_ln", "interpret")
)
def points_encoder_pallas(
    x: jnp.ndarray,  # [N, P, C]
    mask: jnp.ndarray,  # [N, P] bool
    weights: tuple,  # (w1, b1, ln1s, ln1b, w2, b2, w3, b3, ln2s, ln2b, w4, b4)
    out_dim: int,
    has_ln: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    N, P, C = x.shape
    if not fits_vmem(P):
        raise ValueError(
            f"points_encoder_pallas: P={P} exceeds the VMEM block budget "
            f"({_BB_P_BUDGET // 8}); use points_forward_xla"
        )
    w1, b1, ln1s, ln1b, w2, b2, w3, b3, ln2s, ln2b, w4, b4 = [
        w.astype(jnp.float32) for w in weights
    ]
    w3a, w3b = w3[:256], w3[256:]  # concat split: [256,256] + [256,256]

    if N > _CHUNK_ROWS:
        Nc = _round_up(N, _CHUNK_ROWS)
        xc = jnp.pad(x, ((0, Nc - N), (0, 0), (0, 0))).reshape(
            Nc // _CHUNK_ROWS, _CHUNK_ROWS, P, C
        )
        mc = jnp.pad(mask, ((0, Nc - N), (0, 0))).reshape(
            Nc // _CHUNK_ROWS, _CHUNK_ROWS, P
        )
        out = jax.lax.map(
            lambda xm: points_encoder_pallas(
                xm[0], xm[1], weights, out_dim,
                has_ln=has_ln, interpret=interpret,
            ),
            (xc, mc),
        )
        return out.reshape(Nc, out_dim)[:N]

    BB = _block_rows(P)
    Np = _round_up(max(N, 1), BB)
    xp = jnp.pad(x.astype(jnp.float32), ((0, Np - N), (0, 0), (0, 0)))
    mp = jnp.pad(mask.astype(jnp.float32), ((0, Np - N), (0, 0)))

    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_points_kernel, has_ln=has_ln),
        out_shape=jax.ShapeDtypeStruct((Np, out_dim), jnp.float32),
        grid=(Np // BB,),
        in_specs=[
            pl.BlockSpec((BB, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(w1), full(b1), full(ln1s), full(ln1b),
            full(w2), full(b2),
            full(w3a), full(w3b), full(b3), full(ln2s), full(ln2b),
            full(w4), full(b4),
        ],
        out_specs=pl.BlockSpec(
            (BB, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, mp, w1, b1, ln1s, ln1b, w2, b2, w3a, w3b, b3, ln2s, ln2b, w4, b4)
    return out[:N]


def points_forward_xla(x, mask, weights, has_ln: bool = True):
    """Reference path (CPU / backward): same math, compiler-scheduled, f32."""
    w1, b1, ln1s, ln1b, w2, b2, w3, b3, ln2s, ln2b, w4, b4 = [
        w.astype(jnp.float32) for w in weights
    ]
    x = x.astype(jnp.float32)
    m = mask[..., None]

    def ln(h, s, b):
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

    h = x @ w1 + b1
    if has_ln:
        h = ln(h, ln1s, ln1b)
    h = jnp.maximum(h, 0.0)
    h = h @ w2 + b2
    h = jnp.where(m, h, NEG)
    pooled = jnp.max(h, axis=-2, keepdims=True)
    h = h @ w3[:256] + pooled @ w3[256:] + b3
    if has_ln:
        h = ln(h, ln2s, ln2b)
    h = jnp.maximum(h, 0.0)
    h = h @ w4 + b4
    h = jnp.where(m, h, NEG)
    out = jnp.max(h, axis=-2)
    return jnp.where(mask.any(-1)[..., None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _points_encoder_tpu(x, mask, weights, out_dim, has_ln):
    """Pallas forward, XLA backward (rematerialized — same pattern as
    ops/attention.py: nothing saved from the fused forward; the backward
    only runs inside fine-tune fits)."""
    return points_encoder_pallas(x, mask, weights, out_dim, has_ln=has_ln)


def _points_fwd(x, mask, weights, out_dim, has_ln):
    out = points_encoder_pallas(x, mask, weights, out_dim, has_ln=has_ln)
    return out, (x, mask, weights)


def _points_bwd(out_dim, has_ln, res, g):
    x, mask, weights = res
    _, vjp = jax.vjp(
        lambda xx, ww: points_forward_xla(xx, mask, ww, has_ln), x, weights
    )
    dx, dw = vjp(g)
    return dx, None, dw


_points_encoder_tpu.defvjp(_points_fwd, _points_bwd)


def points_encoder(x, mask, weights, out_dim, has_ln=True):
    """[N, P, C] masked-PointNet -> [N, out_dim] f32. Differentiable on
    every backend; fused on TPU."""
    if jax.default_backend() in ("tpu", "axon") and fits_vmem(x.shape[-2]):
        return _points_encoder_tpu(x, mask, weights, out_dim, has_ln)
    return points_forward_xla(x, mask, weights, has_ln)
