import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import (
    LANE_POINTS,
    build_lane_chains,
    make_grid_town,
    make_straight_town,
    nearest_lane_host,
    reference_lines_from_chains,
    route_road_lane_ids,
    route_waypoints,
    trace_route,
)


def _ref_lines(tm, position, route_mask):
    chains = build_lane_chains(tm, route_mask[None])[0]
    cur = tm.nearest_lane(position)
    return reference_lines_from_chains(tm, chains, cur, position)


def test_straight_town_shapes():
    tm = make_straight_town(length=300.0, num_lanes=2)
    assert tm.centerline.shape[1] == LANE_POINTS
    assert bool(tm.valid.all())
    # 2 lanes x 3 segments
    assert tm.num_lanes == 6
    np.testing.assert_allclose(float(tm.width[0]), 3.5)


def test_straight_town_topology():
    tm = make_straight_town(length=300.0, num_lanes=2)
    rid = np.asarray(tm.road_id)
    lid = np.asarray(tm.lane_id)
    succ = np.asarray(tm.successors)
    # lane (road 1, -1) has successor (road 2, -1)
    i = int(np.where((rid == 1) & (lid == -1))[0][0])
    j = int(np.where((rid == 2) & (lid == -1))[0][0])
    assert j in succ[i].tolist()
    # adjacency: lane -1 has right_adj lane -2, lane -2 has left_adj -1
    k = int(np.where((rid == 1) & (lid == -2))[0][0])
    assert int(np.asarray(tm.right_adj)[i]) == k
    assert int(np.asarray(tm.left_adj)[k]) == i


def test_nearest_lane_and_projection():
    tm = make_straight_town(length=300.0, num_lanes=2)
    # point on lane -1 (y=0) at x=150 -> road 2 segment
    idx = int(tm.nearest_lane(jnp.array([150.0, 0.2])))
    assert int(tm.road_id[idx]) == 2
    assert int(tm.lane_id[idx]) == -1
    s, lat, hdg = tm.project(jnp.asarray(idx), jnp.array([150.0, 0.2]))
    np.testing.assert_allclose(float(s), 50.0, atol=0.5)
    np.testing.assert_allclose(float(hdg), 0.0, atol=1e-5)


def test_on_road():
    tm = make_straight_town(length=300.0, num_lanes=2)
    assert bool(tm.on_road(jnp.array([150.0, 0.0])))
    assert bool(tm.on_road(jnp.array([150.0, -3.5])))  # second lane center
    assert not bool(tm.on_road(jnp.array([150.0, 30.0])))  # far off road
    # batch
    pts = jnp.array([[10.0, 0.0], [10.0, 50.0]])
    res = tm.on_road(pts)
    assert res.shape == (2,)
    assert bool(res[0]) and not bool(res[1])


def test_on_road_sdf_matches_exact():
    """The bilinear clearance raster (`on_road`) reproduces the exact
    polyline test (`on_road_exact`) for realistic query points: lane points
    perturbed laterally up to +-6 m — everywhere a bound agent can be.
    Disagreements are tolerated only in a narrow band (+-0.25 m) around the
    drivable boundary (bilinear interpolation error at junction corners)."""
    from rift_tpu.map import make_grid_town

    tm = make_grid_town(blocks=2, num_lanes=2)
    rng = np.random.default_rng(7)
    cl = np.asarray(tm.centerline[np.asarray(tm.valid)]).reshape(-1, 2)
    base = cl[rng.integers(0, len(cl), 8000)]
    pts = jnp.asarray(
        (base + rng.uniform(-6.0, 6.0, size=base.shape)).astype(np.float32)
    )
    exact = np.asarray(tm.on_road_exact(pts))
    fast = np.asarray(tm.on_road(pts))
    clr = np.asarray(tm.road_clearance(pts))
    dis = exact != fast
    boundary_band = np.abs(clr + 0.3) < 0.25
    assert (dis & ~boundary_band).sum() == 0, (
        f"{dis.sum()} disagreements, "
        f"{(dis & ~boundary_band).sum()} outside the boundary band"
    )
    # and the band itself stays rare
    assert dis.mean() < 0.02


def test_query_proximal():
    tm = make_straight_town(length=500.0, num_lanes=2)
    idx, valid = tm.query_proximal(jnp.array([250.0, 0.0]), radius=120.0, max_objects=8)
    assert idx.shape == (8,)
    n_within = int(valid.sum())
    assert n_within >= 4  # several segments within 120 m
    # distance-sorted: first is the current segment
    assert int(tm.road_id[idx[0]]) == 3


def test_grid_town_builds():
    tm = make_grid_town(blocks=2, num_lanes=1)
    assert tm.num_lanes > 20
    assert bool(tm.is_junction.any())
    # all junction connectors have a successor
    succ = np.asarray(tm.successors)
    isj = np.asarray(tm.is_junction)
    assert (succ[isj, 0] >= 0).all()


def test_trace_route_straight():
    tm = make_straight_town(length=500.0, num_lanes=1)
    start = nearest_lane_host(tm, [10.0, 0.0])
    goal = nearest_lane_host(tm, [450.0, 0.0])
    path, dist = trace_route(tm, start, goal)
    assert path is not None
    assert path[0] == start and path[-1] == goal
    assert 350 < dist < 500
    wps = route_waypoints(tm, path)
    assert wps.shape[1] == 3
    assert len(wps) > 300  # ~1m spacing


def test_trace_route_grid_with_turn():
    tm = make_grid_town(blocks=2, num_lanes=1)
    start = nearest_lane_host(tm, [30.0, 1.75])  # heading +x on road y=0... pick any
    goal = nearest_lane_host(tm, [120.0, 60.0])
    path, dist = trace_route(tm, start, goal)
    assert path is not None and np.isfinite(dist)


def test_reference_lines_straight():
    tm = make_straight_town(length=500.0, num_lanes=2)
    start = nearest_lane_host(tm, [10.0, 0.0])
    goal = nearest_lane_host(tm, [450.0, 0.0])
    path, _ = trace_route(tm, start, goal)
    rr, rl = route_road_lane_ids(tm, path)
    route_mask = tm.on_route_mask(jnp.asarray(rr), jnp.asarray(rl))
    refs = _ref_lines(tm, jnp.array([10.0, 0.0]), route_mask)
    assert refs["position"].shape == (4, 120, 2)
    assert refs["valid_mask"].shape == (4, 120)
    # primary line follows the lane: y stays ~0, x increases ~1m/point
    v0 = np.asarray(refs["valid_mask"][0])
    p0 = np.asarray(refs["position"][0])
    assert v0.sum() > 100
    np.testing.assert_allclose(p0[v0][:, 1], 0.0, atol=0.2)
    dx = np.diff(p0[v0][:, 0])
    assert (dx > 0.5).all() and (dx < 1.5).all()
    # adjacent lane (y=-3.5) produces a second valid line
    assert bool(refs["valid_mask"][2].any()) or bool(refs["valid_mask"][1].any())
    # orientation along +x
    o0 = np.asarray(refs["orientation"][0])
    np.testing.assert_allclose(o0[v0], 0.0, atol=0.1)


def test_reference_lines_dedupe():
    # single-lane town: left/right adjacents are invalid; alt-branch slot
    # duplicates the primary and must be masked out by dedupe
    tm = make_straight_town(length=300.0, num_lanes=1)
    L = tm.num_lanes
    route_mask = tm.valid
    refs = _ref_lines(tm, jnp.array([10.0, 0.0]), route_mask)
    valid_lines = np.asarray(refs["valid_mask"]).any(-1)
    assert valid_lines.sum() == 1, f"expected 1 unique line, got {valid_lines}"


def test_reference_lines_jit_under_vmap():
    tm = make_straight_town(length=300.0, num_lanes=2)
    route_mask = tm.valid
    positions = jnp.array([[10.0, 0.0], [50.0, -3.5], [120.0, 0.0]])
    chains = build_lane_chains(tm, route_mask[None])[0]
    refs = jax.vmap(
        lambda p: reference_lines_from_chains(tm, chains, tm.nearest_lane(p), p)
    )(positions)
    assert refs["position"].shape == (3, 4, 120, 2)
    assert bool(refs["valid_mask"][0, 0].any())


# ---------------------------------------------------------------------------
# lane-change route geometry (VERDICT r3 item 8: reference-like topology —
# a route stepping to left_adj/right_adj must produce a monotone lateral
# blend, not a double-back to the adjacent lane's start)
# ---------------------------------------------------------------------------
def _path_has_lane_change(tm, path):
    left = np.asarray(tm.left_adj)
    right = np.asarray(tm.right_adj)
    return any(
        path[k + 1] in (int(left[path[k]]), int(right[path[k]]))
        for k in range(len(path) - 1)
    )


def test_route_waypoints_lane_change_monotone():
    tm = make_straight_town(length=300.0, num_lanes=2)
    start = nearest_lane_host(tm, [5.0, 0.0])       # lane -1 (y=0)
    goal = nearest_lane_host(tm, [295.0, -3.5])     # lane -2 (y=-3.5)
    path, dist = trace_route(tm, start, goal)
    assert path is not None and _path_has_lane_change(tm, path)
    wps = route_waypoints(tm, path)
    x = wps[:, 0]
    # monotone along the road: no double-back to the adjacent lane's start
    assert (np.diff(x) > -1e-6).all(), "lane-change route doubles back"
    # actually moves from the first lane's centerline to the second's
    assert abs(wps[0, 1] - 0.0) < 0.5
    assert abs(wps[-1, 1] - (-3.5)) < 0.5
    # the lateral transition is smooth: per-meter lateral step bounded
    assert np.abs(np.diff(wps[:, 1])).max() < 0.6
    # headings stay sane through the blend (road runs +x)
    assert np.abs(wps[:, 2]).max() < 0.6


def test_grid_route_lane_change_across_junctions():
    """A grid-town route exists that both requires a lane change and crosses
    >= 3 junction lanes (the reference-like-topology acceptance shape)."""
    tm = make_grid_town(blocks=2, num_lanes=2)
    isj = np.asarray(tm.is_junction)
    valid = np.flatnonzero(np.asarray(tm.valid))
    rng = np.random.default_rng(0)
    found = None
    for _ in range(400):
        s, g = rng.choice(valid, 2, replace=False)
        path, dist = trace_route(tm, int(s), int(g))
        if path is None or dist < 150:
            continue
        if _path_has_lane_change(tm, path) and isj[path].sum() >= 3:
            found = path
            break
    assert found is not None, "no lane-change multi-junction route found"
    wps = route_waypoints(tm, found)
    seg = np.linalg.norm(np.diff(wps[:, :2], axis=0), axis=1)
    # ~1 m spacing everywhere, no teleports where the lane change happens
    assert seg.max() < 2.0


def test_route_distance_field_lane_change_arclength():
    """route_distance_field's join arclengths must track the BLENDED route
    geometry across adjacency edges: adjacent lanes overlap physically, so
    a path stepping left/right must not double-count the shared extent
    (it broke interaction matching: post-change J inflated by ~a lane
    length, making every candidate route-unreachable)."""
    from rift_tpu.map.routing import route_distance_field

    tm = make_straight_town(length=300.0, num_lanes=2)
    start = nearest_lane_host(tm, [5.0, 0.0])
    goal = nearest_lane_host(tm, [295.0, -3.5])
    path, dist = trace_route(tm, start, goal)
    assert _path_has_lane_change(tm, path)
    wps = route_waypoints(tm, path)
    D, J = route_distance_field(tm, path)
    length = np.asarray(tm.length)
    cl = np.asarray(tm.centerline)
    P = cl.shape[1]
    # a vehicle at arclength s on a path lane has implied route arclength
    # w* = J + s - D (where recognition's d_cbv(w*) = 0); it must agree
    # with the nearest blended-route waypoint (1 m spacing -> index =
    # meters) to within the LANE_CHANGE_COST bias the reference's
    # adjacency-edged A* shares (global_route_planner.py:159)
    for li in path:
        for frac in (0.2, 0.9):
            s = frac * length[li]
            vi = int(round(frac * (P - 1)))
            xy = cl[li, vi]
            w_idx = float(np.linalg.norm(wps[:, :2] - xy, axis=1).argmin())
            w_star = float(J[li] + s - D[li])
            assert abs(w_star - w_idx) < 25.0, (
                f"lane {li} s={s:.0f}: implied route arclength "
                f"{w_star:.1f} vs actual {w_idx:.1f}"
            )
