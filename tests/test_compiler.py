"""npz compiler validated on a schema-exact TownXX_HD_map.npz fixture.

The fixture (map/npz_fixture.py) writes the exact structure documented at
reference data/map_data/anno/HD-Map-Anno.md and produced by
data/gen_hdmap.py (same np.savez_compressed container, key 'arr'), including
Trigger_Volumes — so compile_town_from_npz is exercised end to end:
geometry, topology, adjacency, lights, stop signs, crosswalks, and a closed
loop on the compiled town.
"""

import numpy as np
import pytest

from rift_tpu.map import (
    compile_town_from_npz,
    grid_town_lanes,
    lanes_to_map_data,
    make_grid_town,
    save_npz,
)


@pytest.fixture(scope="module")
def town_npz(tmp_path_factory):
    lanes = grid_town_lanes(blocks=2, stop_ratio=0.34)
    crosswalks = [
        np.array([[50.0, -8.0], [54.0, -8.0], [54.0, 8.0], [50.0, 8.0]]),
    ]
    md = lanes_to_map_data(lanes, crosswalks)
    path = str(tmp_path_factory.mktemp("maps") / "TownFx_HD_map.npz")
    save_npz(path, md)
    return path, lanes


def test_npz_schema_shape(town_npz):
    """The container matches the reference loader's expectations."""
    path, _ = town_npz
    data = np.load(path, allow_pickle=True)
    md = dict(data["arr"])
    road_ids = [k for k in md if k != "Crosswalks"]
    assert len(road_ids) > 10
    rid = road_ids[0]
    lane = next(v for k, v in md[rid].items() if k != "Trigger_Volumes")
    center = lane["LaneMark"]["Center"][0]
    assert center["Type"] == "Center"
    p0 = center["Points"][0]
    assert len(p0) == 3 and len(p0[0]) == 3 and len(p0[1]) == 3  # loc/rot/junc
    assert "TopologyType" in center
    # trigger volumes exist with both types
    all_tv = [
        tv
        for r in road_ids
        for tv in md[r].get("Trigger_Volumes", [])
    ]
    types = {tv["Type"] for tv in all_tv}
    assert types == {"TrafficLight", "StopSign"}
    assert all("ParentActor_Location" in tv for tv in all_tv)
    assert len(md["Crosswalks"]) == 1


def test_compile_matches_native_build(town_npz):
    """Compiling the npz reproduces the natively built town's structure."""
    path, lanes = town_npz
    tm_npz = compile_town_from_npz(path)
    tm_ref = make_grid_town(blocks=2, stop_ratio=0.34)
    assert tm_npz.num_lanes == tm_ref.num_lanes
    # same lane keys
    keys = lambda tm: sorted(
        zip(np.asarray(tm.road_id).tolist(), np.asarray(tm.lane_id).tolist())
    )
    assert keys(tm_npz) == keys(tm_ref)
    # geometry within resampling tolerance
    np.testing.assert_allclose(
        np.asarray(tm_npz.centerline), np.asarray(tm_ref.centerline), atol=0.2
    )
    # same stop lanes
    np.testing.assert_array_equal(
        np.asarray(tm_npz.stop_lane), np.asarray(tm_ref.stop_lane)
    )
    # signalised connectors recovered (groups may be renumbered, but
    # signalised-or-not and the axis split must match per junction)
    lg_n = np.asarray(tm_npz.light_group)
    lg_r = np.asarray(tm_ref.light_group)
    np.testing.assert_array_equal(lg_n >= 0, lg_r >= 0)
    sig = lg_n >= 0
    if sig.any():
        # same-axis grouping: two connectors share a group in the npz build
        # iff they share one in the native build
        same_n = lg_n[sig][:, None] == lg_n[sig][None, :]
        same_r = lg_r[sig][:, None] == lg_r[sig][None, :]
        np.testing.assert_array_equal(same_n, same_r)
    assert bool(np.asarray(tm_npz.crosswalk_valid).any())


def test_closed_loop_on_compiled_town(town_npz):
    from rift_tpu.scenario import TrafficEnv, route_completion_percent

    path, _ = town_npz
    tm = compile_town_from_npz(path)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=5)
    state, crit, spec = env.reset()
    for _ in range(100):
        state, crit = env.step(state, crit)
    rc = route_completion_percent(crit, state, spec)
    assert float(rc.max()) > 3.0
    assert bool(np.isfinite(np.asarray(state.pos)).all())
