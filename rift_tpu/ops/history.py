"""Pallas kernel: fully-fused HistoryEncoder forward.

The per-agent temporal encoder (models/pluto/layers.py:HistoryEncoder, the
stand-in for the reference's NATSequenceEncoder, embedding.py:8-90) runs a
conv tokenizer, six banded-attention blocks over T=20/10/5 tokens at dim
32/64/128, two strided downsamples and an FPN — ~150 ops whose tensors all
pad to (8,128)/(16,128) HBM tiles at a fraction of logical occupancy. At
B*A = 6144 sequences that is ~5 ms of the 12 ms Pluto forward, all layout
overhead.

This kernel keeps one batch tile's entire pipeline in VMEM: convs as
shifted-slice matmuls, attention per head with precomputed band+RPB bias,
LN/GELU on registers, the FPN linear upsample as a trace-time resize
matrix (extracted from jax.image.resize applied to an identity, so the
interpolation matches exactly). Only the [N, T, C] input and the [N, D]
last-token output touch HBM.

Weights arrive as a flat list (see WEIGHT_ORDER) taken from the
HistoryEncoder param dict; the jnp reference implementation lives in
models/pluto/layers.py:history_forward_jnp and the parity test in
tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 128  # sequences per block (VMEM: weights ~2.5 MB + intermediates)

DEPTHS = (2, 2, 2)
HEADS = (2, 4, 8)
WINDOWS = (3, 3, 5)


def block_dims(embed_dim: int):
    dims = []
    d = embed_dim
    for level, depth in enumerate(DEPTHS):
        dims += [d] * depth
        if level < len(DEPTHS) - 1:
            d *= 2
    return dims  # per-block dims, e.g. [32, 32, 64, 64, 128, 128]


def weight_order(embed_dim: int = 32):
    """Flat parameter names in kernel-operand order."""
    names = ["conv0_w", "conv0_b"]
    for i in range(sum(DEPTHS)):
        names += [
            f"blk{i}_ln1_scale", f"blk{i}_ln1_bias",
            f"blk{i}_qkv_w", f"blk{i}_qkv_b",
            f"blk{i}_out_w", f"blk{i}_out_b",
            f"blk{i}_ln2_scale", f"blk{i}_ln2_bias",
            f"blk{i}_mlp1_w", f"blk{i}_mlp1_b",
            f"blk{i}_mlp2_w", f"blk{i}_mlp2_b",
        ]
    for lv in range(len(DEPTHS)):
        names += [f"level{lv}_ln_scale", f"level{lv}_ln_bias"]
    for lv in range(len(DEPTHS) - 1):
        names += [
            f"down{lv}_w", f"down{lv}_b",
            f"down{lv}_ln_scale", f"down{lv}_ln_bias",
        ]
    for lv in range(len(DEPTHS)):
        names += [f"lat{lv}_w", f"lat{lv}_b"]
    names += ["fpn_w", "fpn_b"]
    return names


# rpb params are handled separately (folded into bias matrices outside the
# kernel): blk{i}_rpb [H, 2w-1]
def rpb_names():
    return [f"blk{i}_rpb" for i in range(sum(DEPTHS))]


def band_rpb_bias(rpb: jnp.ndarray, n: int, window: int) -> jnp.ndarray:
    """[H, n, n] additive bias: clamped neighborhood band + natten RPB."""
    w = min(window, n)
    i = np.arange(n)
    start = np.clip(i - (w - 1) // 2, 0, n - w)
    j = np.arange(n)
    near = (j[None, :] >= start[:, None]) & (j[None, :] < start[:, None] + w)
    band = jnp.asarray(np.where(near, 0.0, -1e9).astype(np.float32))
    rel = np.clip(i[None, :] - i[:, None] + (window - 1), 0, 2 * window - 2)
    return band[None] + rpb[:, rel]


def resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] linear-resize operator: half-pixel-center triangle
    interpolation with edge clamping — jax.image.resize(method='linear')
    semantics for upscaling (verified by the parity test). Pure numpy: this
    runs at trace time, where jnp ops would produce tracers."""
    scale = src / dst
    out = np.zeros((dst, src), np.float32)
    for d in range(dst):
        pos = (d + 0.5) * scale - 0.5
        lo = int(np.floor(pos))
        w = pos - lo
        for idx, wt in ((lo, 1.0 - w), (lo + 1, w)):
            out[d, min(max(idx, 0), src - 1)] += wt
    return out


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu(x):
    # tanh approximation (jax.nn.gelu approximate=True)
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _conv3(x, w, b):
    """k=3 stride-1 SAME conv. x [bb, T, Cin], w [3, Cin, Cout]."""
    z = jnp.zeros_like(x[:, :1])
    xm1 = jnp.concatenate([z, x[:, :-1]], axis=1)
    xp1 = jnp.concatenate([x[:, 1:], z], axis=1)
    dot = lambda a, k: jax.lax.dot_general(
        a, k, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dot(xm1, w[0]) + dot(x, w[1]) + dot(xp1, w[2]) + b


def _conv3_s2(x, w, b):
    """k=3 stride-2 SAME conv (flax/TF SAME for even T: pad_left 0,
    pad_right 1; window t reads 2t, 2t+1, 2t+2). x [bb, T, Cin] ->
    [bb, T//2, Cout]. Even/odd split via reshape (Mosaic-safe)."""
    bb, T, C = x.shape
    pairs = x.reshape(bb, T // 2, 2, C)
    even = pairs[:, :, 0, :]  # positions 2t
    odd = pairs[:, :, 1, :]  # 2t+1
    z = jnp.zeros_like(even[:, :1])
    nxt = jnp.concatenate([even[:, 1:], z], axis=1)  # 2t+2 (right pad)
    dot = lambda a, k: jax.lax.dot_general(
        a, k, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dot(even, w[0]) + dot(odd, w[1]) + dot(nxt, w[2]) + b


def _attn(h, qkv_w, qkv_b, out_w, out_b, bias_hqq, num_heads):
    """Self-attention on [bb, T, D] with additive [H, T, T] bias."""
    D = h.shape[-1]
    Dh = D // num_heads
    qkv = jax.lax.dot_general(
        h, qkv_w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + qkv_b
    outs = []
    for hd in range(num_heads):
        q = qkv[..., hd * Dh : (hd + 1) * Dh]
        k = qkv[..., D + hd * Dh : D + (hd + 1) * Dh]
        v = qkv[..., 2 * D + hd * Dh : 2 * D + (hd + 1) * Dh]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(Dh).astype(np.float32)
        logits = logits + bias_hqq[hd][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        wgt = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                wgt, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o = jnp.concatenate(outs, axis=-1)
    return jax.lax.dot_general(
        o, out_w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + out_b


def _history_kernel(x_ref, *refs, num_blocks, embed_dim):
    # refs: weights in weight_order() + bias matrices per block + resize mats
    names = weight_order(embed_dim)
    W = {n: refs[i][:] for i, n in enumerate(names)}
    nb = len(names)
    biases = [refs[nb + i][:] for i in range(num_blocks)]
    R_up = [refs[nb + num_blocks + i][:] for i in range(len(DEPTHS) - 1)]
    out_ref = refs[-1]

    x = x_ref[:]  # [bb, T, Cin]
    x = _conv3(x, W["conv0_w"], W["conv0_b"])

    dims = block_dims(embed_dim)
    heads_per_block = []
    for lv, depth in enumerate(DEPTHS):
        heads_per_block += [HEADS[lv]] * depth

    outs = []
    bi = 0
    for lv, depth in enumerate(DEPTHS):
        for _ in range(depth):
            h = _ln(x, W[f"blk{bi}_ln1_scale"], W[f"blk{bi}_ln1_bias"])
            h = _attn(
                h, W[f"blk{bi}_qkv_w"], W[f"blk{bi}_qkv_b"],
                W[f"blk{bi}_out_w"], W[f"blk{bi}_out_b"],
                biases[bi], heads_per_block[bi],
            )
            x = x + h
            h = _ln(x, W[f"blk{bi}_ln2_scale"], W[f"blk{bi}_ln2_bias"])
            h = jax.lax.dot_general(
                h, W[f"blk{bi}_mlp1_w"], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + W[f"blk{bi}_mlp1_b"]
            h = _gelu(h)
            h = jax.lax.dot_general(
                h, W[f"blk{bi}_mlp2_w"], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + W[f"blk{bi}_mlp2_b"]
            x = x + h
            bi += 1
        outs.append(_ln(x, W[f"level{lv}_ln_scale"], W[f"level{lv}_ln_bias"]))
        if lv < len(DEPTHS) - 1:
            x = _conv3_s2(x, W[f"down{lv}_w"], W[f"down{lv}_b"])
            x = _ln(x, W[f"down{lv}_ln_scale"], W[f"down{lv}_ln_bias"])

    laterals = [
        _conv3(outs[lv], W[f"lat{lv}_w"], W[f"lat{lv}_b"])
        for lv in range(len(DEPTHS))
    ]
    for i in range(len(laterals) - 1, 0, -1):
        # up[b, d, :] = sum_s R[d, s] * lat[b, s, :], accumulated over the
        # (tiny) source length — Mosaic rejects the dot+transpose form
        R = R_up[i - 1]  # [dst, src]
        lat = laterals[i]
        src = lat.shape[1]
        up = jnp.zeros_like(laterals[i - 1])
        for s_ix in range(src):
            up = up + R[:, s_ix : s_ix + 1][None] * lat[:, s_ix : s_ix + 1, :]
        laterals[i - 1] = laterals[i - 1] + up
    out = _conv3(laterals[0], W["fpn_w"], W["fpn_b"])
    T0 = out.shape[1]
    last = jax.lax.slice_in_dim(out, T0 - 1, T0, axis=1)  # static slice
    out_ref[:] = last[:, 0, :]


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("embed_dim", "interpret"))
def history_encoder_pallas(
    params: dict,  # flat name -> array (weight_order + rpb_names)
    x: jnp.ndarray,  # [N, T, Cin] float32
    embed_dim: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, T, Cin] -> [N, out_dim] last-token features."""
    N, T, Cin = x.shape
    nb = sum(DEPTHS)
    dims = block_dims(embed_dim)

    # fold band + RPB into per-block [H, T_lv, T_lv] biases
    t = T
    biases = []
    bi = 0
    for lv, depth in enumerate(DEPTHS):
        for _ in range(depth):
            biases.append(
                band_rpb_bias(
                    params[f"blk{bi}_rpb"].astype(jnp.float32), t, WINDOWS[lv]
                )
            )
            bi += 1
        if lv < len(DEPTHS) - 1:
            t = -(-t // 2)

    # trace-time resize matrices (exact jax.image.resize semantics)
    lens = [T]
    for _ in range(len(DEPTHS) - 1):
        lens.append(-(-lens[-1] // 2))
    R_up = [
        jnp.asarray(resize_matrix(lens[i + 1], lens[i]))
        for i in range(len(DEPTHS) - 1)
    ]

    Np = _round_up(N, BB)
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0), (0, 0)))

    names = weight_order(embed_dim)
    weights = [params[n].astype(jnp.float32) for n in names]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((BB, T, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    in_specs += [full(w) for w in weights]
    in_specs += [full(b) for b in biases]
    in_specs += [full(r) for r in R_up]

    out_dim = dims[-1]
    out = pl.pallas_call(
        functools.partial(
            _history_kernel, num_blocks=nb, embed_dim=embed_dim
        ),
        out_shape=jax.ShapeDtypeStruct((Np, out_dim), jnp.float32),
        grid=(Np // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BB, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), *weights, *biases, *R_up)
    return out[:N]


# ---------------------------------------------------------------------------
# Per-level stage kernel: 2 LocalBlocks (LN -> attn -> +res -> LN -> MLP ->
# +res) fused. The single whole-encoder kernel above OOMs the Mosaic compile
# helper; one level (~50 ops) compiles in tens of seconds and still removes
# every intermediate HBM round-trip inside the level.
# ---------------------------------------------------------------------------
_STAGE_WNAMES = (
    "ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "out_w", "out_b",
    "ln2_scale", "ln2_bias", "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b",
)


def _stage_kernel(x_ref, *refs, num_heads):
    n_w = 2 * len(_STAGE_WNAMES)
    ws = [refs[i][:] for i in range(n_w)]
    biases = [refs[n_w][:], refs[n_w + 1][:]]
    out_ref = refs[-1]
    x = x_ref[:]
    for blk in range(2):
        W = dict(zip(_STAGE_WNAMES, ws[blk * 12 : (blk + 1) * 12]))
        h = _ln(x, W["ln1_scale"], W["ln1_bias"])
        h = _attn(
            h, W["qkv_w"], W["qkv_b"], W["out_w"], W["out_b"],
            biases[blk], num_heads,
        )
        x = x + h
        h = _ln(x, W["ln2_scale"], W["ln2_bias"])
        h = jax.lax.dot_general(
            h, W["mlp1_w"], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + W["mlp1_b"]
        h = _gelu(h)
        h = jax.lax.dot_general(
            h, W["mlp2_w"], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + W["mlp2_b"]
        x = x + h
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def local_stage_pallas(
    x: jnp.ndarray,  # [N, T, D] float32
    stage_weights: tuple,  # 24 arrays: _STAGE_WNAMES for block 0 then 1
    bias0: jnp.ndarray,  # [H, T, T]
    bias1: jnp.ndarray,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    N, T, D = x.shape
    bb = BB
    Np = _round_up(N, bb)
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0), (0, 0)))
    ws = [w.astype(jnp.float32) for w in stage_weights]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stage_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((Np, T, D), jnp.float32),
        grid=(Np // bb,),
        in_specs=[xspec] + [full(w) for w in ws] + [
            full(bias0), full(bias1)
        ],
        out_specs=xspec,
        interpret=interpret,
    )(x.astype(jnp.float32), *ws, bias0.astype(jnp.float32),
      bias1.astype(jnp.float32))
    return out[:N]
