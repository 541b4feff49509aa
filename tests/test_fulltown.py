"""Full-town-scale map proof + applied weather (VERDICT r1 item 7).

A multi-junction town at realistic scale (>=200 lanes) is exported to the
reference's TownXX_HD_map.npz schema (map/npz_fixture.py == data/gen_hdmap.py
structure), compiled by map/compiler.py, and driven closed-loop with
scenarios on DIFFERENT routes sharing the same junction network — lights
and stop signs live. Parsed route weather is interpolated (Weather.at),
recorded into route statistics, and applied by the BEV renderer.
"""

import numpy as np
import pytest

from rift_tpu.map import (
    compile_town_from_npz,
    grid_town_lanes,
    lanes_to_map_data,
    save_npz,
)


@pytest.fixture(scope="module")
def full_town(tmp_path_factory):
    lanes = grid_town_lanes(blocks=4, num_lanes=2, stop_ratio=0.3)
    crosswalks = [
        np.array([[115.0, -8.0], [119.0, -8.0], [119.0, 8.0], [115.0, 8.0]]),
        np.array([[235.0, 112.0], [239.0, 112.0], [239.0, 128.0],
                  [235.0, 128.0]]),
    ]
    md = lanes_to_map_data(lanes, crosswalks)
    path = str(tmp_path_factory.mktemp("fulltown") / "TownFs_HD_map.npz")
    save_npz(path, md)
    return path, lanes


def test_town_scale_and_criteria_surface(full_town):
    path, lanes = full_town
    assert len(lanes) >= 200, "not town-scale"
    tm = compile_town_from_npz(path)
    n_lanes = int(np.count_nonzero(np.asarray(tm.valid)))
    assert n_lanes >= 200
    # both signalised junctions AND all-way stops came through the npz
    lg = np.asarray(tm.light_group)
    junc = np.asarray(tm.is_junction)
    assert (lg[junc & np.asarray(tm.valid)] >= 0).any(), "no lights"
    assert np.asarray(tm.stop_lane).any(), "no stop lanes"
    assert bool(np.asarray(tm.crosswalk_valid).any()), "no crosswalks"


def test_multi_route_eval_on_compiled_town(full_town):
    """4 scenarios, distinct routes over the shared junction network, 150
    closed-loop ticks with walkers+statics: states finite, junction roads
    shared between at least two routes, and the full statistics row
    computes."""
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.scenario.statistics import StatisticsManager

    path, _ = full_town
    tm = compile_town_from_npz(path)
    env = TrafficEnv(
        tm, num_scenarios=4, num_agents=12, seed=11,
        num_walkers=1, num_statics=1,
    )
    state, crit, spec = env.reset()

    # distinct routes...
    rids = np.asarray(spec.route_road_ids)
    road_sets = [frozenset(int(r) for r in row if r >= 0) for row in rids]
    assert len(set(road_sets)) >= 2, "all scenarios on one route"
    # ...that still share parts of the town's road network
    shared = any(
        road_sets[i] & road_sets[j]
        for i in range(len(road_sets))
        for j in range(i + 1, len(road_sets))
    )
    assert shared, "routes never share a road - not a shared town"

    for _ in range(150):
        state, crit = env.step(state, crit)
    assert bool(np.isfinite(np.asarray(state.pos)).all())
    assert float(np.asarray(state.ego_route_cursor).max()) > 5.0

    stats = StatisticsManager()
    stats.register_episode(crit, state, spec)
    g = stats.compute_global_statistics()
    assert g.total_routes == 4
    assert np.isfinite(g.avg_driving_score)


def test_weather_interpolation_and_recording(tmp_path):
    from rift_tpu.scenario.routes import Weather

    w = Weather(keyframes=[
        {"route_percentage": "0", "cloudiness": "10", "precipitation": "0",
         "sun_altitude_angle": "45"},
        {"route_percentage": "100", "cloudiness": "90", "precipitation": "80",
         "sun_altitude_angle": "-10"},
    ])
    mid = w.at(50.0)
    assert abs(mid["cloudiness"] - 50.0) < 1e-6
    assert abs(mid["precipitation"] - 40.0) < 1e-6
    assert abs(mid["sun_altitude_angle"] - 17.5) < 1e-6
    # clamped outside the keyframe range; empty weather stays empty
    assert w.at(150.0)["precipitation"] == 80.0
    assert Weather().at(30.0) == {}

    # recorded into the statistics row at the route's completion pct
    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.scenario.statistics import StatisticsManager

    tm = make_straight_town(length=300.0)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=0)
    state, crit, spec = env.reset()
    for _ in range(20):
        state, crit = env.step(state, crit)
    stats = StatisticsManager(str(tmp_path / "r.json"))
    stats.register_episode(crit, state, spec, weathers=[w])
    rec = stats.records[0]
    assert set(rec.weather) >= {"cloudiness", "precipitation"}
    # persisted through the results json
    import json

    stats.save()
    data = json.load(open(tmp_path / "r.json"))
    assert "weather" in data["records"][0]


def test_renderer_applies_weather():
    from rift_tpu.map import make_straight_town
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.viz.render import BEVRenderer

    tm = make_straight_town(length=200.0)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=0)
    state, _, _ = env.reset()
    r = BEVRenderer(tm)
    fig_clear = r.render(state, 0, weather={})
    fig_rain = r.render(
        state, 0,
        weather={"precipitation": 80.0, "fog_density": 30.0,
                 "cloudiness": 90.0},
    )
    # the weather overlay adds a patch and the HUD line names the conditions
    assert len(fig_rain.axes[0].patches) == len(fig_clear.axes[0].patches) + 1
    assert "precipitation" in fig_rain.axes[0].get_title()
    import matplotlib.pyplot as plt

    plt.close(fig_clear)
    plt.close(fig_rain)
