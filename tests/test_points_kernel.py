"""Parity for the fused PointsEncoder kernel (ops/points.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.ops.points import (
    points_encoder_pallas,
    points_forward_xla,
)


def _weights(rng, C, out_dim):
    r = np.random.default_rng(rng)
    mk = lambda *s: jnp.asarray(r.normal(0, 0.3, s), jnp.float32)
    return (
        mk(C, 128), mk(128), jnp.abs(mk(128)) + 0.5, mk(128),
        mk(128, 256), mk(256),
        mk(512, 256), mk(256), jnp.abs(mk(256)) + 0.5, mk(256),
        mk(256, out_dim), mk(out_dim),
    )


@pytest.mark.parametrize("has_ln", [True, False])
def test_kernel_matches_xla_reference(has_ln):
    N, P, C, out = 300, 21, 10, 128  # N not a multiple of the block size
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 2.0, (N, P, C)), jnp.float32)
    mask = jnp.asarray(r.random((N, P)) < 0.7)
    mask = mask.at[5].set(False)  # an all-masked row must come out zero
    w = _weights(1, C, out)

    ref = points_forward_xla(x, mask, w, has_ln)
    ker = points_encoder_pallas(x, mask, w, out, has_ln=has_ln, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)
    assert np.asarray(ref)[5].max() == 0.0


def test_module_routes_through_fused_op_and_trains():
    """The flax module must produce the op's output exactly on CPU and stay
    differentiable (BC pretrain trains through the map encoder)."""
    from rift_tpu.models.pluto.layers import PointsEncoder

    N, P, C = 40, 11, 6
    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(0, 1.0, (N, P, C)), jnp.float32)
    mask = jnp.asarray(r.random((N, P)) < 0.8)
    mod = PointsEncoder(64)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(params, x, mask)
    assert out.shape == (N, 64)
    assert bool(jnp.isfinite(out).all())

    # param tree keeps the converter-facing names
    names = set(params["params"].keys())
    assert names == {
        "Dense_0", "Dense_1", "Dense_2", "Dense_3",
        "LayerNorm_0", "LayerNorm_1",
    }
    assert params["params"]["Dense_2"]["kernel"].shape == (512, 256)

    g = jax.grad(
        lambda p: mod.apply(p, x, mask).sum()
    )(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(a).all()) for a in flat)
    assert any(float(jnp.abs(a).max()) > 0 for a in flat)


def test_module_4d_batch_and_norm_none():
    from rift_tpu.models.pluto.layers import PointsEncoder

    r = np.random.default_rng(5)
    x = jnp.asarray(r.normal(0, 1.0, (2, 7, 9, 4)), jnp.float32)
    mask = jnp.asarray(r.random((2, 7, 9)) < 0.8)
    mod = PointsEncoder(32, norm="none")
    params = mod.init(jax.random.PRNGKey(1), x, mask)
    out = mod.apply(params, x, mask)
    assert out.shape == (2, 7, 32)
    # no LayerNorm params in the "none" variant (folded-BN torch weights)
    assert set(params["params"]["flat"].keys()) == {
        "Dense_0", "Dense_1", "Dense_2", "Dense_3"
    }


def test_chunked_path_matches_xla_reference(monkeypatch):
    """N > _CHUNK_ROWS routes through lax.map over row chunks (the fix for
    the live fit-path VMEM OOM: XLA scoped the whole f32[16384,128] output
    on the VMEM stack). Shrink the chunk size so CPU-interpret covers it."""
    import rift_tpu.ops.points as pts

    monkeypatch.setattr(pts, "_CHUNK_ROWS", 64)
    N, P, C, out = 150, 20, 10, 128  # 3 chunks, last one padded
    r = np.random.default_rng(7)
    x = jnp.asarray(r.normal(0, 1.5, (N, P, C)), jnp.float32)
    mask = jnp.asarray(r.random((N, P)) < 0.7)
    w = _weights(2, C, out)

    ref = points_forward_xla(x, mask, w, True)
    ker = pts.points_encoder_pallas.__wrapped__(
        x, mask, w, out, has_ln=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)


def test_oversized_p_raises_and_dispatch_falls_back():
    """ADVICE r2: a P beyond the VMEM block budget must fail loudly in the
    kernel and silently take the XLA path in the dispatcher."""
    from rift_tpu.ops.points import fits_vmem, points_encoder

    P = 2048
    assert not fits_vmem(P)
    N, C, out = 4, 10, 128
    r = np.random.default_rng(9)
    x = jnp.asarray(r.normal(0, 1.0, (N, P, C)), jnp.float32)
    mask = jnp.asarray(r.random((N, P)) < 0.7)
    w = _weights(3, C, out)
    with pytest.raises(ValueError, match="VMEM block budget"):
        points_encoder_pallas(x, mask, w, out, interpret=True)
    # dispatcher: CPU backend + oversized P both route to XLA
    got = points_encoder(x, mask, w, out)
    ref = points_forward_xla(x, mask, w, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
