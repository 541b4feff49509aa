"""Pallas kernel: fused multi-head attention for small sequences.

The Pluto forward is dominated not by FLOPs but by HBM layout waste: its
attentions run at T in {4..97} tokens with head_dim 16..32, and the standard
formulation materializes [.., T, H, Dh] projections, [.., H, T, T] logits and
softmax weights — every one of which TPU pads to (8, 128) tiles (a head_dim-16
tensor pays 8x its logical bandwidth; profiled at ~11 ms of a 16.5 ms forward,
tools/prof/prof_knock.py). This kernel keeps Q/K/V packed as [B, T, D] in HBM
and does head-split -> QK^T -> bias/mask -> softmax -> AV entirely in VMEM:
one read of q/k/v, one write of out, zero materialized intermediates.

Replaces (in spirit) the natten/torch MHA stack of the reference
(rift/cbv/planning/pluto/model/layers/embedding.py NATSequenceEncoder,
transformer.py MultiheadAttention) — there CUDA kernels hide the same
problem; on TPU a fused kernel is the idiomatic answer.

Numerics: logits and softmax in float32 regardless of input dtype; the
weights are cast back to the input dtype for the AV matmul. Matches the XLA
fallback path to float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
# VMEM budget per block (bytes); v5e+ cores have ~16 MB usable
_VMEM_BUDGET = 4 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, kpad_ref, out_ref, *, num_heads, scale):
    """One batch tile: q [bb, Tq, D], k/v [bb, Tk, D], bias [H, Tq, Tk],
    kpad [bb, Tk] additive f32, out [bb, Tq, D]."""
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    kpad = kpad_ref[:]  # [bb, Tk]
    H = num_heads
    D = q.shape[-1]
    Dh = D // H
    outs = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        qh = q[..., sl]
        kh = k[..., sl]
        vh = v[..., sl]
        logits = jax.lax.dot_general(
            qh, kh,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [bb, Tq, Tk]
        logits = logits + bias_ref[h][None] + kpad[:, None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                w.astype(v.dtype), vh,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        )
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def fused_attention_pallas(
    q: jnp.ndarray,  # [B, Tq, D]
    k: jnp.ndarray,  # [B, Tk, D]
    v: jnp.ndarray,  # [B, Tk, D]
    bias: jnp.ndarray,  # [H, Tq, Tk] additive f32 (zeros when unused)
    kpad_add: jnp.ndarray,  # [B, Tk] additive f32 (0 or NEG_INF)
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Tq, D = q.shape
    Tk = k.shape[1]
    Dh = D // num_heads
    scale = 1.0 / (Dh ** 0.5)

    # batch tile size under the VMEM budget. Count PADDED tile sizes: VMEM
    # tiles are (8, 128) f32 / (16, 128) bf16, so a [bb, 12, 12] f32 logits
    # block really occupies bb x 16 x 128 — 10x its logical bytes.
    it = q.dtype.itemsize
    sub = 8 * 4 // it  # sublane quantum for this dtype
    d_p = _round_up(D, 128)
    dh_p = _round_up(Dh, 128)
    tq_s = _round_up(Tq, sub)
    tk_s = _round_up(Tk, sub)
    qkv_bytes = (2 * tq_s + 2 * tk_s) * d_p * it
    logits_bytes = 3 * _round_up(Tq, 8) * _round_up(Tk, 128) * 4  # f32 x ~3 live
    head_out_bytes = num_heads * tq_s * dh_p * it
    bytes_per_row = qkv_bytes + logits_bytes + head_out_bytes
    bb = max(8, min(512, _VMEM_BUDGET // max(bytes_per_row, 1)))
    bb = _round_up(min(bb, B), 8)
    Bp = _round_up(B, bb)
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, Bp - B), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, Bp - B), (0, 0), (0, 0)))
        kpad_add = jnp.pad(kpad_add, ((0, Bp - B), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, Tq, D), q.dtype),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, Tq, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Tk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Tk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads, Tq, Tk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bb, Tk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, Tq, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), kpad_add.astype(jnp.float32))
    return out[:B]


def fused_attention_xla(q, k, v, bias, kpad_add, num_heads):
    """Reference path (CPU / fallback): same math, compiler-scheduled."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    Dh = D // num_heads
    qh = q.reshape(B, Tq, num_heads, Dh)
    kh = k.reshape(B, Tk, num_heads, Dh)
    vh = v.reshape(B, Tk, num_heads, Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) / (
        Dh ** 0.5
    )
    logits = logits + bias[None] + kpad_add[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(B, Tq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_attention_tpu(q, k, v, bias, kpad_add, num_heads):
    """Differentiable wrapper: Pallas kernel forward, XLA backward.

    The backward pass recomputes the attention with the XLA formulation and
    differentiates that — flash-attention-style rematerialization: nothing
    from the fused forward is saved except the primals, and the one-off
    [B, H, Tq, Tk] backward materialization only happens during fine-tune
    fits (256 steps per buffer-full round), where it is noise next to the
    optimizer step. Without this VJP, full-model training (bc_pluto's
    bootstrap pretrain; any loss whose grad flows past pi_head) fails to
    linearize on TPU."""
    return fused_attention_pallas(q, k, v, bias, kpad_add, num_heads)


def _fused_attention_fwd(q, k, v, bias, kpad_add, num_heads):
    out = fused_attention_pallas(q, k, v, bias, kpad_add, num_heads)
    return out, (q, k, v, bias, kpad_add)


def _fused_attention_bwd(num_heads, res, g):
    q, k, v, bias, kpad_add = res
    _, vjp = jax.vjp(
        lambda *a: fused_attention_xla(*a, num_heads), q, k, v, bias, kpad_add
    )
    return vjp(g)


_fused_attention_tpu.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(q, k, v, bias, kpad_add, num_heads):
    """[B, Tq, D] x [B, Tk, D]^2 (+ bias [H, Tq, Tk], kpad_add [B, Tk]) ->
    [B, Tq, D]. Softmax in f32. Differentiable on every backend."""
    if jax.default_backend() in ("tpu", "axon"):
        return _fused_attention_tpu(q, k, v, bias, kpad_add, num_heads)
    return fused_attention_xla(q, k, v, bias, kpad_add, num_heads)
