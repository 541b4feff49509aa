import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.ops.lane_query import (
    lane_min_dist2,
    lane_min_dist2_pallas,
    lane_min_dist2_xla,
)


def _data(n=37, l=21, p=21, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-100, 100, (n, 2)).astype(np.float32))
    cl = jnp.asarray(rng.uniform(-100, 100, (l, p, 2)).astype(np.float32))
    return pts, cl


def _reference(pts, cl):
    diff = np.asarray(cl)[None] - np.asarray(pts)[:, None, None]
    return (diff**2).sum(-1).min(-1)


def test_xla_path_matches_reference():
    pts, cl = _data()
    out = lane_min_dist2_xla(pts, cl)
    np.testing.assert_allclose(np.asarray(out), _reference(pts, cl), rtol=1e-4, atol=1e-2)


def test_pallas_interpret_matches_reference():
    pts, cl = _data(n=130, l=140)  # force multi-tile grid with padding
    out = lane_min_dist2_pallas(pts, cl, interpret=True)
    assert out.shape == (130, 140)
    np.testing.assert_allclose(np.asarray(out), _reference(pts, cl), rtol=1e-4, atol=1e-2)


def test_dispatch_runs_on_default_backend():
    pts, cl = _data(n=8, l=6)
    out = lane_min_dist2(pts, cl)
    np.testing.assert_allclose(np.asarray(out), _reference(pts, cl), rtol=1e-4, atol=1e-2)


# ---------------------------------------------------------------------------
# Fused attention kernel (ops/attention.py)
# ---------------------------------------------------------------------------
from rift_tpu.ops.attention import (
    NEG_INF,
    fused_attention_pallas,
    fused_attention_xla,
)


def _attn_data(b=12, tq=12, tk=12, d=64, h=4, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, tq, d)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(b, tk, d)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(b, tk, d)).astype(np.float32), dtype)
    bias = jnp.asarray(rng.normal(size=(h, tq, tk)).astype(np.float32))
    pad = jnp.asarray(
        np.where(rng.uniform(size=(b, tk)) < 0.3, NEG_INF, 0.0).astype(np.float32)
    )
    # keep at least one unmasked key per row
    pad = pad.at[:, 0].set(0.0)
    return q, k, v, bias, pad


def _attn_reference(q, k, v, bias, pad, h):
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // h
    qh = np.asarray(q, np.float32).reshape(b, tq, h, dh)
    kh = np.asarray(k, np.float32).reshape(b, tk, h, dh)
    vh = np.asarray(v, np.float32).reshape(b, tk, h, dh)
    logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(dh)
    logits = logits + np.asarray(bias)[None] + np.asarray(pad)[:, None, None, :]
    logits -= logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, tq, d)


def test_attention_xla_matches_reference():
    q, k, v, bias, pad = _attn_data()
    out = fused_attention_xla(q, k, v, bias, pad, 4)
    np.testing.assert_allclose(
        np.asarray(out), _attn_reference(q, k, v, bias, pad, 4), rtol=1e-4, atol=1e-4
    )


def test_attention_pallas_interpret_matches_reference():
    # odd batch (padding path), cross-attention (tq != tk), head_dim 16
    q, k, v, bias, pad = _attn_data(b=37, tq=5, tk=20, d=32, h=2, seed=1)
    out = fused_attention_pallas(q, k, v, bias, pad, 2, interpret=True)
    assert out.shape == q.shape
    np.testing.assert_allclose(
        np.asarray(out), _attn_reference(q, k, v, bias, pad, 2), rtol=1e-4, atol=1e-4
    )


def test_attention_pallas_interpret_bf16():
    q, k, v, bias, pad = _attn_data(b=16, tq=12, tk=12, d=128, h=4, dtype=jnp.bfloat16)
    out = fused_attention_pallas(q, k, v, bias, pad, 4, interpret=True)
    ref = _attn_reference(q, k, v, bias, pad, 4)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), ref, rtol=0.1, atol=0.1
    )


# ---------------------------------------------------------------------------
# Fused PID re-tracking rollout (ops/retrack.py)
# ---------------------------------------------------------------------------
def test_retrack_pallas_matches_scan_path():
    from rift_tpu.ops.retrack import retrack_rollout_pallas
    from rift_tpu.rl.evaluator import rollout_candidates

    rng = np.random.default_rng(3)
    G, T = 9, 40  # odd G exercises block padding (BB=128)
    # smooth forward trajectories with gentle curvature
    headings = np.cumsum(rng.normal(0, 0.02, (G, T)), axis=1).astype(np.float32)
    step = rng.uniform(0.4, 0.9, (G, 1)).astype(np.float32)
    dx = np.cos(headings) * step
    dy = np.sin(headings) * step
    pos = np.stack([np.cumsum(dx, 1), np.cumsum(dy, 1)], -1).astype(np.float32)
    ref_pos = jnp.asarray(pos)
    ref_h = jnp.asarray(headings)
    v0 = jnp.asarray(rng.uniform(2.0, 8.0, (G,)).astype(np.float32))

    # jnp scan reference (the CPU fallback inside rollout_candidates)
    c_ref, h_ref, v_ref = rollout_candidates(ref_pos, ref_h, v0)
    c_k, h_k, v_k = retrack_rollout_pallas(ref_pos, ref_h, v0, T, 0.1, interpret=True)

    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref), rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Ref-line matrices kernel (ops/refline.py)
# ---------------------------------------------------------------------------
def test_refline_pallas_interpret_matches_xla():
    from rift_tpu.ops.refline import refline_matrices_pallas
    from rift_tpu.rl.evaluator import ref_line_matrices

    rng = np.random.default_rng(5)
    R, M, T, Nr = 3, 4, 10, 30
    cand = jnp.asarray(rng.normal(0, 20, (R, M, T, 2)).astype(np.float32))
    ch = jnp.asarray(rng.normal(0, 1, (R, M, T)).astype(np.float32))
    rp = jnp.asarray(
        np.cumsum(rng.normal(1.0, 0.2, (R, Nr, 2)), 1).astype(np.float32)
    )
    rh = jnp.asarray(rng.normal(0, 1, (R, Nr)).astype(np.float32))
    rv = jnp.asarray(rng.uniform(size=(R, Nr)) < 0.8)
    rv = rv.at[:, 0].set(True)

    dd_ref, da_ref = ref_line_matrices(cand, ch, rp, rh, rv)
    dd, da = refline_matrices_pallas(
        cand.reshape(R, M * T, 2), ch.reshape(R, M * T), rp, rh, rv,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(dd).reshape(R, M, T), np.asarray(dd_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(da).reshape(R, M, T), np.asarray(da_ref), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Fused HistoryEncoder kernel (ops/history.py)
# ---------------------------------------------------------------------------
def test_history_pallas_interpret_matches_jnp():
    import jax
    from flax import linen as nn

    from rift_tpu.models.pluto.layers import HistoryEncoder, history_forward_jnp
    from rift_tpu.ops.history import history_encoder_pallas

    rng = np.random.default_rng(11)
    N, T, C = 9, 20, 9
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    m = HistoryEncoder(dtype=None)
    params = m.init(jax.random.PRNGKey(0), x[:2])
    # params initialized by the flax module; run both paths over them
    W = params["params"]
    ref = history_forward_jnp(W, x, dtype=None)
    out = history_encoder_pallas(dict(W), x, 32, interpret=True)
    assert out.shape == (N, 128)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_history_resize_matrix_matches_jax_image():
    import jax

    from rift_tpu.ops.history import resize_matrix

    for src, dst in ((5, 10), (10, 20), (3, 7)):
        R = resize_matrix(src, dst)
        eye = jnp.eye(src, dtype=jnp.float32)
        R_jax = np.asarray(jax.image.resize(eye, (dst, src), method="linear"))
        np.testing.assert_allclose(R, R_jax, rtol=1e-5, atol=1e-5)


def test_local_stage_pallas_interpret_matches_blocks():
    """The 2-LocalBlock stage kernel must equal the per-block jnp path."""
    import jax

    from rift_tpu.models.pluto.layers import HistoryEncoder, history_forward_jnp
    from rift_tpu.ops.history import (
        _STAGE_WNAMES,
        band_rpb_bias,
        local_stage_pallas,
    )

    rng = np.random.default_rng(13)
    N, T, D, H = 7, 20, 32, 2
    x = jnp.asarray(rng.normal(size=(N, T, D)).astype(np.float32))
    m = HistoryEncoder(dtype=None)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((2, T, 9)))["params"]
    sw = tuple(params[f"blk{b}_{nm}"] for b in (0, 1) for nm in _STAGE_WNAMES)
    b0 = band_rpb_bias(params["blk0_rpb"], T, 3)
    b1 = band_rpb_bias(params["blk1_rpb"], T, 3)
    out = local_stage_pallas(x, sw, b0, b1, H, interpret=True)

    # per-block jnp reference
    ref = x
    for b in (0, 1):
        W = {nm: params[f"blk{b}_{nm}"] for nm in _STAGE_WNAMES}
        h32 = ref.astype(np.float32)
        mu = h32.mean(-1, keepdims=True)
        var = h32.var(-1, keepdims=True)
        h = (h32 - mu) / np.sqrt(var + 1e-5) * W["ln1_scale"] + W["ln1_bias"]
        qkv = h @ W["qkv_w"] + W["qkv_b"]
        qh = np.asarray(qkv[..., :D]).reshape(N, T, H, D // H)
        kh = np.asarray(qkv[..., D : 2 * D]).reshape(N, T, H, D // H)
        vh = np.asarray(qkv[..., 2 * D :]).reshape(N, T, H, D // H)
        bias = np.asarray(b0 if b == 0 else b1)
        logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(D // H)
        logits = logits + bias[None]
        logits -= logits.max(-1, keepdims=True)
        wgt = np.exp(logits)
        wgt /= wgt.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", wgt, vh).reshape(N, T, D)
        att = att @ np.asarray(W["out_w"]) + np.asarray(W["out_b"])
        ref = np.asarray(ref) + att
        mu = ref.mean(-1, keepdims=True)
        var = ref.var(-1, keepdims=True)
        h = (ref - mu) / np.sqrt(var + 1e-5) * np.asarray(W["ln2_scale"]) + np.asarray(W["ln2_bias"])
        h = h @ np.asarray(W["mlp1_w"]) + np.asarray(W["mlp1_b"])
        c = np.sqrt(2.0 / np.pi)
        h = 0.5 * h * (1.0 + np.tanh(c * (h + 0.044715 * h**3)))
        h = h @ np.asarray(W["mlp2_w"]) + np.asarray(W["mlp2_b"])
        ref = ref + h
        ref = jnp.asarray(ref.astype(np.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)
