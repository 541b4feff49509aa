import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.geometry import (
    box_corners,
    global_to_local,
    local_to_global,
    nearest_point_index,
    obb_overlap,
    obb_overlap_matrix,
    point_in_obb,
    polyline_arclength,
    polyline_headings,
    project_point_to_polyline,
    resample_polyline,
    rotate,
    se2_compose,
    se2_inverse,
    wrap_angle,
)


def test_wrap_angle():
    np.testing.assert_allclose(wrap_angle(jnp.pi + 0.1), -jnp.pi + 0.1, atol=1e-6)
    np.testing.assert_allclose(wrap_angle(-3 * jnp.pi), jnp.pi, atol=1e-6)
    np.testing.assert_allclose(wrap_angle(0.5), 0.5, atol=1e-6)


def test_rotate_roundtrip():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (32, 2))
    th = jax.random.uniform(jax.random.PRNGKey(1), (32,), minval=-3, maxval=3)
    back = rotate(rotate(pts, th), -th)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_frame_transforms_roundtrip():
    pts = jnp.array([[3.0, 4.0], [-1.0, 2.0]])
    origin = jnp.array([10.0, -5.0])
    heading = jnp.array(0.7)
    local = global_to_local(pts, origin, heading)
    glob = local_to_global(local, origin, heading)
    np.testing.assert_allclose(glob, pts, atol=1e-5)


def test_se2_compose_inverse():
    a = jnp.array([1.0, 2.0, 0.5])
    ident = se2_compose(a, se2_inverse(a))
    np.testing.assert_allclose(ident, jnp.zeros(3), atol=1e-6)


def test_box_corners_axis_aligned():
    # width 2 (y extent), length 4 (x extent), zero heading
    c = box_corners(jnp.zeros(2), jnp.array(0.0), jnp.array([2.0, 4.0]))
    # FL, RL, RR, FR
    expected = np.array([[2, 1], [-2, 1], [-2, -1], [2, -1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(c), expected, atol=1e-6)


def test_obb_overlap_simple():
    z = jnp.zeros(2)
    sh = jnp.array([2.0, 4.0])
    assert bool(obb_overlap(z, 0.0, sh, jnp.array([3.0, 0.0]), 0.0, sh))
    assert not bool(obb_overlap(z, 0.0, sh, jnp.array([5.0, 0.0]), 0.0, sh))
    # rotated: diagonal box barely touching
    assert bool(
        obb_overlap(z, jnp.pi / 4, sh, jnp.array([2.0, 2.0]), jnp.pi / 4, sh)
    )


def test_obb_overlap_vs_shapely_random():
    shapely = pytest.importorskip("shapely")
    from shapely.geometry import Polygon

    rng = np.random.default_rng(42)
    n = 200
    ca = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    cb = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    ha = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    hb = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    sa = rng.uniform(0.5, 4.0, (n, 2)).astype(np.float32)
    sb = rng.uniform(0.5, 4.0, (n, 2)).astype(np.float32)

    ours = np.asarray(obb_overlap(ca, ha, sa, cb, hb, sb))
    corners_a = np.asarray(box_corners(ca, ha, sa))
    corners_b = np.asarray(box_corners(cb, hb, sb))
    for i in range(n):
        truth = Polygon(corners_a[i]).intersects(Polygon(corners_b[i]))
        assert ours[i] == truth, f"mismatch at {i}"


def test_obb_overlap_matrix_shape():
    g, n = 7, 5
    rng = np.random.default_rng(0)
    m = obb_overlap_matrix(
        jnp.asarray(rng.uniform(-5, 5, (g, 2))),
        jnp.asarray(rng.uniform(-3, 3, g)),
        jnp.asarray(rng.uniform(1, 3, (g, 2))),
        jnp.asarray(rng.uniform(-5, 5, (n, 2))),
        jnp.asarray(rng.uniform(-3, 3, n)),
        jnp.asarray(rng.uniform(1, 3, (n, 2))),
    )
    assert m.shape == (g, n)
    assert m.dtype == jnp.bool_


def test_point_in_obb():
    c = jnp.zeros(2)
    sh = jnp.array([2.0, 4.0])
    assert bool(point_in_obb(jnp.array([1.9, 0.0]), c, 0.0, sh))
    assert not bool(point_in_obb(jnp.array([2.1, 0.0]), c, 0.0, sh))
    assert not bool(point_in_obb(jnp.array([0.0, 1.1]), c, 0.0, sh))
    # rotate box 90deg: length axis now along y
    assert bool(point_in_obb(jnp.array([0.0, 1.9]), c, jnp.pi / 2, sh))


def test_polyline_arclength_and_resample():
    line = jnp.array([[0.0, 0.0], [3.0, 0.0], [3.0, 4.0]])
    s = polyline_arclength(line)
    np.testing.assert_allclose(np.asarray(s), [0.0, 3.0, 7.0], atol=1e-6)
    rs = resample_polyline(line, 8)
    assert rs.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(rs[0]), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs[-1]), [3, 4], atol=1e-5)
    seg = np.diff(np.asarray(rs), axis=0)
    lens = np.linalg.norm(seg, axis=1)
    assert lens.std() < 0.3  # near-uniform spacing


def test_polyline_headings():
    line = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    h = polyline_headings(line)
    np.testing.assert_allclose(np.asarray(h), [0.0, np.pi / 2, np.pi / 2], atol=1e-6)


def test_project_point_to_polyline():
    line = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    s, lat, h = project_point_to_polyline(line, jnp.array([3.0, 2.0]))
    np.testing.assert_allclose(float(s), 3.0, atol=1e-5)
    # point is to the LEFT of the +x tangent; reference sign: delta_dis = -cross
    np.testing.assert_allclose(float(lat), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(h), 0.0, atol=1e-6)

    s2, lat2, _ = project_point_to_polyline(line, jnp.array([3.0, -2.0]))
    np.testing.assert_allclose(float(lat2), -2.0, atol=1e-5)


def test_project_point_clamps_to_ends():
    line = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    s, _, _ = project_point_to_polyline(line, jnp.array([-5.0, 1.0]))
    np.testing.assert_allclose(float(s), 0.0, atol=1e-6)
    s, _, _ = project_point_to_polyline(line, jnp.array([25.0, 1.0]))
    np.testing.assert_allclose(float(s), 10.0, atol=1e-5)


def test_nearest_point_index_with_mask():
    line = jnp.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
    mask = jnp.array([True, True, True, False])
    idx = nearest_point_index(line, jnp.array([1.9, 0.5]), mask)
    assert int(idx) == 2


def test_batched_projection():
    lines = jnp.stack(
        [
            jnp.stack([jnp.linspace(0, 10, 5), jnp.zeros(5)], axis=-1),
            jnp.stack([jnp.zeros(5), jnp.linspace(0, 10, 5)], axis=-1),
        ]
    )  # (2, 5, 2)
    queries = jnp.array([[5.0, 1.0], [1.0, 5.0]])
    s, lat, h = project_point_to_polyline(lines, queries)
    np.testing.assert_allclose(np.asarray(s), [5.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), [0.0, np.pi / 2], atol=1e-6)
