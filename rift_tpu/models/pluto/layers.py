"""Flax building blocks for the Pluto planner.

Re-designed from the reference's torch modules (rift/cbv/planning/pluto/model/
layers/*) for TPU: the natten NeighborhoodAttention1D history encoder becomes
banded full attention (equivalent receptive field; at T<=21 tokens a dense
band mask is MXU-friendly where gather-based neighborhood attention is not),
and BatchNorm in the PointNet encoders becomes LayerNorm (mask-friendly,
no running stats to sync across shards).

All blocks take a `dtype` compute dtype (params stay float32): bf16 halves
activation HBM traffic and doubles MXU throughput on TPU; softmax runs in
float32 for stability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPLayer(nn.Module):
    """Linear -> LayerNorm -> ReLU -> Linear (reference mlp_layer.py)."""

    hidden: int
    out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class FourierEmbedding(nn.Module):
    """Learned Fourier features per input channel, summed
    (reference layers/fourier_embedding.py)."""

    dim: int
    num_freq_bands: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: (..., C). Per-channel MLPs run as channel-stacked einsums (one
        # kernel for all C channels instead of a C-long Python loop of tiny
        # Dense/LN ops — the embedders dominate the forward at these sizes).
        C = x.shape[-1]
        F = self.num_freq_bands
        D = self.dim
        freqs = self.param("freqs", nn.initializers.normal(1.0), (C, F))
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(batch_axis=(0,)), (C, 2 * F + 1, D)
        )
        b1 = self.param("b1", nn.initializers.zeros, (C, D))
        ln_scale = self.param("ln_scale", nn.initializers.ones, (C, D))
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (C, D))
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(batch_axis=(0,)), (C, D, D)
        )
        b2 = self.param("b2", nn.initializers.zeros, (C, D))

        dt = self.dtype or jnp.float32
        phased = x[..., None] * freqs * 2 * jnp.pi  # (..., C, F)
        feats = jnp.concatenate(
            [jnp.cos(phased), jnp.sin(phased), x[..., None]], axis=-1
        ).astype(dt)  # (..., C, 2F+1)
        h = jnp.einsum("...cf,cfd->...cd", feats, w1.astype(dt)) + b1.astype(dt)
        # per-channel LayerNorm over d
        h32 = h.astype(jnp.float32)
        mu = h32.mean(-1, keepdims=True)
        var = h32.var(-1, keepdims=True)
        h = ((h32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt)
        h = h * ln_scale.astype(dt) + ln_bias.astype(dt)
        h = nn.relu(h)
        out = jnp.einsum("...cd,cde->...e", h, w2.astype(dt)) + b2.sum(0).astype(dt)
        out = nn.LayerNorm(epsilon=1e-5, name="out_ln", dtype=self.dtype)(out)
        out = nn.relu(out)
        return nn.Dense(self.dim, name="out_fc", dtype=self.dtype)(out)


class _Lin(nn.Module):
    """nn.Dense-compatible params (kernel/bias) with a weights() accessor so
    fused kernels can consume them without materialising the module path."""

    features: int

    @nn.compact
    def weights(self, in_dim: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNP(nn.Module):
    """nn.LayerNorm-compatible params (scale/bias) accessor."""

    @nn.compact
    def weights(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,))
        return s, b


class PointsEncoder(nn.Module):
    """Masked PointNet: per-point MLP, max-pool, concat global, second MLP,
    final max-pool (reference layers/embedding.py:PointsEncoder).

    The whole pipeline runs through ops/points.py: one fused Pallas kernel
    on TPU (the XLA path materialised ~0.5 GB/tick of layout-padded
    intermediates over the 12k polygon rows), the same math via XLA
    elsewhere and for the backward. Param tree stays nn.Dense/nn.LayerNorm
    shaped (Dense_0..3, LayerNorm_0/1) for the torch converter."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None
    # "ln" (mask-friendly from-scratch default) or "none" (pretrained torch
    # weights: the reference's eval-mode BatchNorm folds into the preceding
    # Linear — see convert.py — leaving no norm op here)
    norm: str = "ln"

    @nn.compact
    def __call__(self, x, mask):
        # x: (..., N, C); mask: (..., N)
        # flatten leading dims to 3D (one row per polygon/line)
        batch = x.shape[:-2]
        if len(batch) > 1:
            out = PointsEncoder(
                self.out_dim, name="flat", dtype=self.dtype, norm=self.norm
            )(
                x.reshape((-1,) + x.shape[-2:]),
                mask.reshape((-1,) + mask.shape[-1:]),
            )
            return out.reshape(batch + (self.out_dim,))

        from ...ops.points import points_encoder

        C = x.shape[-1]
        has_ln = self.norm == "ln"
        w1, b1 = _Lin(128, name="Dense_0").weights(C)
        if has_ln:
            ln1s, ln1b = _LNP(name="LayerNorm_0").weights(128)
        else:
            ln1s, ln1b = jnp.ones(128), jnp.zeros(128)
        w2, b2 = _Lin(256, name="Dense_1").weights(128)
        w3, b3 = _Lin(256, name="Dense_2").weights(512)
        if has_ln:
            ln2s, ln2b = _LNP(name="LayerNorm_1").weights(256)
        else:
            ln2s, ln2b = jnp.ones(256), jnp.zeros(256)
        w4, b4 = _Lin(self.out_dim, name="Dense_3").weights(256)

        out = points_encoder(
            x, mask,
            (w1, b1, ln1s, ln1b, w2, b2, w3, b3, ln2s, ln2b, w4, b4),
            self.out_dim, has_ln=has_ln,
        )
        return out.astype(self.dtype or x.dtype)


def drop_path(x, rate: float, deterministic: bool, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    import jax

    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class _PackedProj(nn.Module):
    """Dense projection with DenseGeneral-compatible params (kernel
    [in, H, Dh], bias [H, Dh]) but a PACKED [.., H*Dh] output — the
    [.., T, H, Dh] layout pads Dh to 128 lanes in HBM (8x waste at Dh=16)."""

    num_heads: int
    head_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, just_weights: bool = False):
        H, Dh = self.num_heads, self.head_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=0, out_axis=(1, 2)),
            (x.shape[-1], H, Dh),
        )
        bias = self.param("bias", nn.initializers.zeros, (H, Dh))
        dt = self.dtype or jnp.float32
        w = kernel.reshape(x.shape[-1], H * Dh).astype(dt)
        b = bias.reshape(H * Dh).astype(dt)
        if just_weights:
            return w, b
        return x.astype(dt) @ w + b


class _PackedOut(nn.Module):
    """Output projection, DenseGeneral(axis=(-2,-1))-compatible params
    (kernel [H, Dh, out], bias [out]) taking packed [.., H*Dh] input."""

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        H, Dh = self.num_heads, self.head_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (H, Dh, self.out_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        dt = self.dtype or jnp.float32
        return (
            x.astype(dt) @ kernel.reshape(H * Dh, self.out_dim).astype(dt)
            + bias.astype(dt)
        )


class Attention(nn.Module):
    """Multi-head attention with optional key-padding / band masks.

    Q/K/V stay packed [.., T, D] end to end; on TPU the core runs as one
    fused Pallas kernel (ops/attention.py) — head split, QK^T, bias, f32
    softmax and AV never touch HBM. Param tree matches torch MHA via the
    converter (kernel [D, H, Dh] / [H, Dh, D])."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    # neighborhood-attention relative position bias: learn rpb [H, 2w-1]
    # indexed by (j - i) clamped to a window of w keys (natten's RPB — lets
    # pretrained NATLayer weights load losslessly)
    rel_pos_window: int = 0

    @nn.compact
    def __call__(
        self,
        q,
        k=None,
        v=None,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (..., Nk) True=pad
        attn_bias: Optional[jnp.ndarray] = None,  # (Nq, Nk) or (H, Nq, Nk)
        deterministic: bool = True,
    ):
        from ...ops.attention import NEG_INF, fused_attention

        k = q if k is None else k
        v = k if v is None else v
        H = self.num_heads
        Dh = self.dim // H
        Tq, _ = q.shape[-2:]
        Tk = k.shape[-2]
        lead = q.shape[:-2]

        # merge projections sharing an input into one matmul (self-attention:
        # one [D, 3D]; q==k: one [D, 2D]) — param trees stay separate
        proj_q = _PackedProj(H, Dh, name="q", dtype=self.dtype)
        proj_k = _PackedProj(H, Dh, name="k", dtype=self.dtype)
        proj_v = _PackedProj(H, Dh, name="v", dtype=self.dtype)
        dt = self.dtype or jnp.float32
        if q is k and k is v:
            wq, bq = proj_q(q, just_weights=True)
            wk, bk = proj_k(q, just_weights=True)
            wv, bv = proj_v(q, just_weights=True)
            qkv = q.astype(dt) @ jnp.concatenate(
                [wq, wk, wv], -1
            ) + jnp.concatenate([bq, bk, bv])
            D = H * Dh
            qp, kp, vp = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
        elif q is k:
            wq, bq = proj_q(q, just_weights=True)
            wk, bk = proj_k(q, just_weights=True)
            qk = q.astype(dt) @ jnp.concatenate(
                [wq, wk], -1
            ) + jnp.concatenate([bq, bk])
            D = H * Dh
            qp, kp = qk[..., :D], qk[..., D:]
            vp = proj_v(v)
        else:
            qp = proj_q(q)
            kp = proj_k(k)
            vp = proj_v(v)

        bias = jnp.zeros((H, Tq, Tk), jnp.float32)
        if self.rel_pos_window > 0:
            w = self.rel_pos_window
            rpb = self.param(
                "rpb", nn.initializers.zeros, (H, 2 * w - 1)
            )  # relative offsets -(w-1)..(w-1)
            i = jnp.arange(Tq)
            rel = jnp.clip(i[None, :] - i[:, None] + (w - 1), 0, 2 * w - 2)
            bias = bias + rpb[:, rel]
        if attn_bias is not None:
            bias = bias + jnp.broadcast_to(
                attn_bias.astype(jnp.float32), (H, Tq, Tk)
            )
        if key_padding_mask is not None:
            kpad_add = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(
                jnp.float32
            )
            kpad_add = jnp.broadcast_to(kpad_add, lead + (Tk,))
        else:
            kpad_add = jnp.zeros(lead + (Tk,), jnp.float32)

        B = 1
        for d in lead:
            B *= d
        qf = qp.reshape(B, Tq, H * Dh)
        kf = kp.reshape(B, Tk, H * Dh)
        vf = vp.reshape(B, Tk, H * Dh)
        pf = kpad_add.reshape(B, Tk)

        if self.dropout > 0.0 and not deterministic:
            # train-time attention dropout needs the weight matrix — use the
            # XLA path and drop there
            Dh_ = Dh
            qh = qf.reshape(B, Tq, H, Dh_)
            kh = kf.reshape(B, Tk, H, Dh_)
            vh = vf.reshape(B, Tk, H, Dh_)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(
                jnp.float32
            ) / jnp.sqrt(Dh_)
            logits = logits + bias[None] + pf[:, None, None, :]
            wgt = nn.softmax(logits, axis=-1)
            if self.dtype is not None:
                wgt = wgt.astype(self.dtype)
            wgt = nn.Dropout(self.dropout)(wgt, deterministic=False)
            out = jnp.einsum("bhqk,bkhd->bqhd", wgt, vh).reshape(
                B, Tq, H * Dh_
            )
        else:
            out = fused_attention(qf, kf, vf, bias, pf, H)
        out = out.reshape(lead + (Tq, H * Dh))
        return _PackedOut(H, Dh, self.dim, name="out", dtype=self.dtype)(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN encoder block (reference layers/transformer.py:40-94)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = Attention(self.dim, self.num_heads, self.dropout, dtype=self.dtype)(
            h, key_padding_mask=key_padding_mask, deterministic=deterministic
        )
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        return x


def band_mask(n: int, window: int) -> jnp.ndarray:
    """(n, n) additive bias: the dense equivalent of natten's 1-D
    neighborhood attention — every query attends to exactly `window` keys,
    centered where possible and clamped at sequence edges
    (natten NeighborhoodAttention1D semantics)."""
    w = min(window, n)
    i = jnp.arange(n)
    start = jnp.clip(i - (w - 1) // 2, 0, n - w)
    j = jnp.arange(n)
    near = (j[None, :] >= start[:, None]) & (j[None, :] < start[:, None] + w)
    return jnp.where(near, 0.0, -1e9)


class LocalBlock(nn.Module):
    """Banded-attention block standing in for the reference's NATLayer."""

    dim: int
    num_heads: int
    window: int
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = x.shape[-2]
        bias = band_mask(n, self.window)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      rel_pos_window=self.window)(
            h, attn_bias=bias, deterministic=deterministic
        )
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        return x


def history_forward_jnp(
    W: dict,
    x: jnp.ndarray,
    embed_dim: int = 32,
    depths: tuple = (2, 2, 2),
    num_heads: tuple = (2, 4, 8),
    windows: tuple = (3, 3, 5),
    drop_path_rate: float = 0.2,
    deterministic: bool = True,
    dtype=None,
    dropout_rng=None,
):
    """Reference HistoryEncoder forward over the flat param dict `W`
    (names: ops/history.py:weight_order + blk{i}_rpb). Used on CPU and as
    the parity baseline for the fused TPU kernel."""
    from ...ops.history import band_rpb_bias

    dt = dtype or jnp.float32
    cast = lambda a: a.astype(dt)

    def conv3(x, w, b, stride=1):
        return jax.lax.conv_general_dilated(
            x, cast(w), (stride,), "SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + cast(b)

    def ln(x, s, b):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return (
            ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * cast(s)
            + cast(b)
        )

    x = conv3(cast(x), W["conv0_w"], W["conv0_b"])
    outs = []
    total = sum(depths)
    # stage kernels are parity-tested but off by default: Mosaic compiles
    # them in O(10 min) each and the level-2 block brushes the 16 MB VMEM
    # ceiling — the fused-attention path below already captures most of the
    # win. Flip on via RIFT_TPU_HISTORY_STAGE_KERNEL=1 to experiment.
    import os

    use_stage_kernel = (
        deterministic
        and os.environ.get("RIFT_TPU_HISTORY_STAGE_KERNEL") == "1"
        and jax.default_backend() in ("tpu", "axon")
    )
    bi = 0
    for lv, depth in enumerate(depths):
        H = num_heads[lv]
        n = x.shape[-2]
        if use_stage_kernel and depth == 2:
            from ...ops.history import (
                _STAGE_WNAMES,
                band_rpb_bias,
                local_stage_pallas,
            )

            sw = tuple(
                W[f"blk{b}_{nm}"]
                for b in (bi, bi + 1)
                for nm in _STAGE_WNAMES
            )
            b0 = band_rpb_bias(
                W[f"blk{bi}_rpb"].astype(jnp.float32), n, windows[lv]
            )
            b1 = band_rpb_bias(
                W[f"blk{bi + 1}_rpb"].astype(jnp.float32), n, windows[lv]
            )
            x = local_stage_pallas(
                x.astype(jnp.float32), sw, b0, b1, H
            ).astype(dt)
            bi += 2
            outs.append(
                ln(x, W[f"level{lv}_ln_scale"], W[f"level{lv}_ln_bias"])
            )
            if lv < len(depths) - 1:
                x = conv3(x, W[f"down{lv}_w"], W[f"down{lv}_b"], stride=2)
                x = ln(x, W[f"down{lv}_ln_scale"], W[f"down{lv}_ln_bias"])
            continue
        for _ in range(depth):
            rate = drop_path_rate * (bi / max(total - 1, 1))
            bias = band_rpb_bias(
                W[f"blk{bi}_rpb"].astype(jnp.float32), n, windows[lv]
            )
            h = ln(x, W[f"blk{bi}_ln1_scale"], W[f"blk{bi}_ln1_bias"])
            D = h.shape[-1]
            qkv = h @ cast(W[f"blk{bi}_qkv_w"]) + cast(W[f"blk{bi}_qkv_b"])
            from ...ops.attention import fused_attention

            att = fused_attention(
                qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :],
                bias, jnp.zeros((h.shape[0], h.shape[1]), jnp.float32), H,
            )
            att = att @ cast(W[f"blk{bi}_out_w"]) + cast(W[f"blk{bi}_out_b"])
            if not deterministic and rate > 0.0 and dropout_rng is not None:
                dropout_rng, k1 = jax.random.split(dropout_rng)
                att = drop_path(att, rate, False, k1)
            x = x + att
            h = ln(x, W[f"blk{bi}_ln2_scale"], W[f"blk{bi}_ln2_bias"])
            h = h @ cast(W[f"blk{bi}_mlp1_w"]) + cast(W[f"blk{bi}_mlp1_b"])
            h = nn.gelu(h)
            h = h @ cast(W[f"blk{bi}_mlp2_w"]) + cast(W[f"blk{bi}_mlp2_b"])
            if not deterministic and rate > 0.0 and dropout_rng is not None:
                dropout_rng, k2 = jax.random.split(dropout_rng)
                h = drop_path(h, rate, False, k2)
            x = x + h
            bi += 1
        outs.append(ln(x, W[f"level{lv}_ln_scale"], W[f"level{lv}_ln_bias"]))
        if lv < len(depths) - 1:
            x = conv3(x, W[f"down{lv}_w"], W[f"down{lv}_b"], stride=2)
            x = ln(x, W[f"down{lv}_ln_scale"], W[f"down{lv}_ln_bias"])

    laterals = [
        conv3(outs[lv], W[f"lat{lv}_w"], W[f"lat{lv}_b"])
        for lv in range(len(depths))
    ]
    for i in range(len(laterals) - 1, 0, -1):
        tgt_len = laterals[i - 1].shape[-2]
        up = jax.image.resize(
            laterals[i],
            laterals[i].shape[:-2] + (tgt_len, laterals[i].shape[-1]),
            method="linear",
        )
        laterals[i - 1] = laterals[i - 1] + up
    out = conv3(laterals[0], W["fpn_w"], W["fpn_b"])
    return out[..., -1, :]  # last token


class HistoryEncoder(nn.Module):
    """Temporal encoder for per-agent history vectors.

    Stands in for NATSequenceEncoder (reference layers/embedding.py:8-90):
    conv tokenizer, three banded-attention stages with stride-2 conv
    downsampling, FPN-style fusion, last-token readout.

    Params are a FLAT dict (ops/history.py:weight_order) so the whole
    forward can run as one fused Pallas kernel on TPU — ~150 tiny tensors'
    worth of HBM tile padding collapses to one input read + one output
    write. Off TPU (and under train-time drop-path) the jnp reference
    path `history_forward_jnp` runs instead.
    """

    embed_dim: int = 32  # dim // 4
    depths: tuple = (2, 2, 2)
    num_heads: tuple = (2, 4, 8)
    windows: tuple = (3, 3, 5)
    drop_path_rate: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, T, C_in)
        from ...ops.history import block_dims, rpb_names, weight_order

        C_in = x.shape[-1]
        dims = block_dims(self.embed_dim)
        nlv = len(self.depths)

        def shp(name):
            d = {
                "conv0_w": (3, C_in, self.embed_dim),
                "conv0_b": (self.embed_dim,),
                "fpn_w": (3, dims[-1], dims[-1]),
                "fpn_b": (dims[-1],),
            }
            if name in d:
                return d[name]
            if name.startswith("blk"):
                i = int(name[3 : name.index("_")])
                dd = dims[i]
                suffix = name[name.index("_") + 1 :]
                return {
                    "ln1_scale": (dd,), "ln1_bias": (dd,),
                    "qkv_w": (dd, 3 * dd), "qkv_b": (3 * dd,),
                    "out_w": (dd, dd), "out_b": (dd,),
                    "ln2_scale": (dd,), "ln2_bias": (dd,),
                    "mlp1_w": (dd, 3 * dd), "mlp1_b": (3 * dd,),
                    "mlp2_w": (3 * dd, dd), "mlp2_b": (dd,),
                }[suffix]
            if name.startswith("level"):
                lv = int(name[5])
                dd = dims[sum(self.depths[: lv + 1]) - 1]
                return (dd,)
            if name.startswith("down"):
                lv = int(name[4])
                din = dims[sum(self.depths[: lv + 1]) - 1]
                if name.endswith("_w"):
                    return (3, din, 2 * din)
                return (2 * din,)
            if name.startswith("lat"):
                lv = int(name[3])
                din = dims[sum(self.depths[: lv + 1]) - 1]
                if name.endswith("_w"):
                    return (3, din, dims[-1])
                return (dims[-1],)
            raise KeyError(name)

        def init_for(name, shape):
            if name.endswith(("_b", "_bias")) or "rpb" in name:
                return nn.initializers.zeros
            if name.endswith("_scale"):
                return nn.initializers.ones
            if name.endswith("_w") and len(shape) == 3:  # conv [k, in, out]
                return nn.initializers.lecun_normal(
                    in_axis=(0, 1), out_axis=2
                )
            return nn.initializers.lecun_normal()

        W = {}
        for name in weight_order(self.embed_dim):
            s = shp(name)
            W[name] = self.param(name, init_for(name, s), s)
        bi = 0
        for lv, depth in enumerate(self.depths):
            for _ in range(depth):
                W[f"blk{bi}_rpb"] = self.param(
                    f"blk{bi}_rpb", nn.initializers.zeros,
                    (self.num_heads[lv], 2 * self.windows[lv] - 1),
                )
                bi += 1

        # the single fully-fused kernel OOMs the Mosaic compile helper at
        # 6 blocks; until split per level, the jnp path (whose attentions
        # already run through ops/attention.py's fused kernel) is the TPU
        # path too
        use_kernel = False
        if use_kernel:
            from ...ops.history import history_encoder_pallas

            lead = x.shape[:-2]
            flat = x.reshape((-1,) + x.shape[-2:])
            out = history_encoder_pallas(
                {k: v for k, v in W.items()}, flat, self.embed_dim
            )
            return out.reshape(lead + (dims[-1],)).astype(
                self.dtype or jnp.float32
            )
        rng = (
            self.make_rng("dropout")
            if not deterministic and self.drop_path_rate > 0
            else None
        )
        return history_forward_jnp(
            W, x, self.embed_dim, self.depths, self.num_heads, self.windows,
            self.drop_path_rate, deterministic, self.dtype, rng,
        )


class StateAttentionEncoder(nn.Module):
    """Ego current-state encoder with per-channel tokens + attention pooling
    and train-time channel dropout (reference agent_encoder.py:97-140)."""

    state_channel: int
    dim: int
    state_dropout: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, state_channel). Per-channel 1->dim projections as one
        # stacked broadcast-multiply instead of C tiny Dense ops.
        C = self.state_channel
        dt = self.dtype or jnp.float32
        proj_w = self.param(
            "proj_w",
            nn.initializers.lecun_normal(in_axis=1, out_axis=2, batch_axis=(0,)),
            (C, 1, self.dim),
        )
        proj_b = self.param("proj_b", nn.initializers.zeros, (C, self.dim))
        h = (
            x[..., None].astype(dt) * proj_w[:, 0].astype(dt)
            + proj_b.astype(dt)
        )  # (B, C, dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, self.state_channel, self.dim)
        )
        h = h + pos
        query = self.param("query", nn.initializers.normal(0.02), (1, 1, self.dim))
        q = jnp.broadcast_to(query, h.shape[:-2] + (1, self.dim))

        key_padding = None
        if not deterministic and self.state_dropout > 0:
            import jax

            rng = self.make_rng("dropout")
            # first 3 channels (x, y, heading) always visible
            drop = (
                jax.random.uniform(rng, h.shape[:-2] + (self.state_channel - 3,))
                < self.state_dropout
            )
            key_padding = jnp.concatenate(
                [jnp.zeros(h.shape[:-2] + (3,), bool), drop], axis=-1
            )

        out = Attention(self.dim, num_heads=4, dtype=self.dtype)(
            q, h, h, key_padding_mask=key_padding, deterministic=deterministic
        )
        return out[..., 0, :]
