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
