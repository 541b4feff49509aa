"""Persistent shared town (VERDICT r2 item 9).

`shared_map_from_routes` compiles ALL of a run's routes into ONE
TensorMap: proximal routes keep true relative town geometry, transversal
route-route crossings become SHARED signalised junctions (route A phase g,
route B phase g+1 — each is the other's cross traffic), and the map is
reused across every episode instead of per-batch corridor rebuilds
(reference contract: one CarlaMap per town, nuplan_map_utils.py:46-66).
"""

import numpy as np
import pytest

from rift_tpu.map import route_waypoints
from rift_tpu.map.from_route import (
    ROAD_ID_STRIDE,
    _resample,
    _route_crossings,
    map_from_routes,
    shared_map_from_routes,
)
from rift_tpu.scenario import TrafficEnv
from rift_tpu.scenario.routes import parse_routes_file
from rift_tpu.sim.traffic_lights import GREEN, group_state

ROUTES_220 = "/root/reference/rift/scenario/route/bench2drive220.xml"


def _east():
    return np.stack([np.linspace(0, 400, 41), np.zeros(41)], -1)


def _north():
    return np.stack([np.full(41, 200.0), np.linspace(-200, 200, 41)], -1)


def test_crossing_detection_transversal_only():
    cross = _route_crossings([_resample(_east()), _resample(_north())])
    assert len(cross) == 1
    i, ii, j, jj = cross[0]
    assert (i, j) == (0, 1)
    # both indices near the geometric crossing (200, 0)
    assert abs(_resample(_east())[ii][0] - 200.0) < 6.0
    assert abs(_resample(_north())[jj][1] - 0.0) < 6.0
    # parallel overlap is NOT a crossing
    shifted = _east() + np.array([0.0, 2.0])
    assert _route_crossings([_resample(_east()), _resample(shifted)]) == []


def test_shared_junction_phases_oppose():
    tmap, paths = shared_map_from_routes([_east(), _north()], num_lanes=2)
    lg = np.asarray(tmap.light_group)
    rid = np.asarray(tmap.road_id)
    junc = np.asarray(tmap.is_junction)
    # each route's primary path crosses a signalised connector holding the
    # SHARED pair of phases (0 for route 0, 1 for route 1)
    for r, want in ((0, 0), (1, 1)):
        path = paths[r]
        path_groups = lg[path][junc[path]]
        assert want in set(path_groups.tolist()), (r, path_groups)
        # connectors belong to the right route's road-id block
        own = rid[path] // ROAD_ID_STRIDE == r
        assert own.all()
    # opposing phases: never both green, and each gets its green window
    greens = {0: False, 1: False}
    for tick in range(240):
        s0 = int(group_state(np.int32(0), np.int32(tick)))
        s1 = int(group_state(np.int32(1), np.int32(tick)))
        assert not ((s0 == GREEN) and (s1 == GREEN)), (tick, s0, s1)
        greens[0] |= s0 == GREEN
        greens[1] |= s1 == GREEN
    assert greens[0] and greens[1]
    # no synthetic perpendicular arms at the shared crossing: every lane
    # belongs to one of the two routes' id blocks
    assert set((rid[rid >= 0] // ROAD_ID_STRIDE).tolist()) == {0, 1}


def test_shared_crossing_is_geometrically_coincident():
    tmap, paths = shared_map_from_routes([_east(), _north()], num_lanes=2)
    lg = np.asarray(tmap.light_group)
    junc = np.asarray(tmap.is_junction)
    cl = np.asarray(tmap.centerline)
    mid = lambda g: cl[junc & (lg == g)][:, 7]  # connector midpoints
    m0, m1 = mid(0), mid(1)
    d = np.linalg.norm(m0[:, None] - m1[None], axis=-1).min()
    assert d < 12.0, f"shared junction not coincident ({d:.1f} m apart)"


def test_isolated_routes_tile_apart():
    far = _east() + np.array([0.0, 5000.0])
    tmap, paths = shared_map_from_routes([_east(), far], num_lanes=2)
    # no SHARED crossings: straight routes still get synthetic
    # through-junctions (own light groups), but the two tiles' lanes
    # must not touch
    rid = np.asarray(tmap.road_id)
    cl = np.asarray(tmap.centerline)
    blk = rid // ROAD_ID_STRIDE
    d = np.linalg.norm(
        cl[(blk == 0) & (rid >= 0)].reshape(-1, 2)[:, None]
        - cl[(blk == 1) & (rid >= 0)].reshape(-1, 2)[None],
        axis=-1,
    ).min()
    assert d > 50.0
    assert all(len(p) > 0 for p in paths)
    for p in paths:
        start = route_waypoints(tmap, p)[0, :2]
        assert bool(tmap.on_road(start))


def test_closed_loop_on_shared_town():
    """Both routes drive the SAME map concurrently; each ego negotiates its
    junctions against crossing traffic. Lights are frozen green, matching
    the product protocol (run.py --lights green = env_wrapper.py:91) —
    under cycling lights the reference's 3-s AgentBlockedTest would fail
    any route that waits out a red phase."""
    import jax.numpy as jnp

    tmap, paths = shared_map_from_routes([_east(), _north()], num_lanes=2)
    tmap = tmap.replace(light_group=jnp.full_like(tmap.light_group, -1))
    env = TrafficEnv(tmap, num_scenarios=2, num_agents=8, seed=3)
    routes = [route_waypoints(tmap, p) for p in paths]
    state, crit, spec = env.reset(routes=routes, lane_paths=paths)
    for _ in range(800):
        state, crit = env.step(state, crit)
        if bool(crit.done.all()):
            break
    # each ego either completed or progressed through its crossing
    p0 = float(state.pos[0, 0, 0])
    p1 = float(state.pos[1, 0, 1])
    assert bool(crit.route_complete[0]) or p0 > 210.0
    assert bool(crit.route_complete[1]) or p1 > -190.0  # started at y=-200+tile


def test_map_reused_across_episodes():
    """The whole point: one tmap object across episodes — resets only
    reselect lane paths (run.py --shared_town reset_env branch)."""
    tmap, paths = shared_map_from_routes([_east(), _north()], num_lanes=2)
    env = TrafficEnv(tmap, num_scenarios=1, num_agents=6, seed=0)
    id0 = id(env.tmap)
    for ep, p in enumerate([paths[0], paths[1], paths[0]]):
        routes = [route_waypoints(env.tmap, p)]
        state, crit, spec = env.reset(routes=routes, lane_paths=[p])
        for _ in range(20):
            state, crit = env.step(state, crit)
        assert id(env.tmap) == id0
        assert np.isfinite(np.asarray(state.pos)).all()


def test_shipped_crossing_pairs_share_junctions():
    """bench2drive220 contains genuinely-crossing route pairs (Town04 /
    Town12); compiled shared, they must produce >=2 routes sharing a
    signalised junction."""
    configs = parse_routes_file(ROUTES_220)
    by_town = {}
    for c in configs:
        by_town.setdefault(c.town, []).append(c)
    # find one transversally-crossing pair among Town04/Town12 routes
    pair = None
    for town in ("Town04", "Town12"):
        lst = by_town.get(town, [])
        polys = [_resample(c.keypoints) for c in lst]
        cross = _route_crossings(polys)
        if cross:
            i, _, j, _ = cross[0]
            pair = [lst[i], lst[j]]
            break
    assert pair is not None, "route library lost its crossing pairs?"
    tmap, paths = shared_map_from_routes(
        [c.keypoints for c in pair], num_lanes=2
    )
    lg = np.asarray(tmap.light_group)
    junc = np.asarray(tmap.is_junction)
    # the shared phase pair (0, 1) exists on junction connectors
    shared = set(lg[junc & (lg >= 0)].tolist())
    assert 0 in shared and 1 in shared
    for p in paths:
        start = route_waypoints(tmap, p)[0, :2]
        assert bool(tmap.on_road(start))
