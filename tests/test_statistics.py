"""BASELINE.md metric-table reproducibility.

Covers: leaderboard penalty math (statistics_manager.py:27-44,466-556),
behavior histograms (CBV_DATA_BINS binning, :306-360), criticality 2-D
distributions + weighted stats (plot_eval_result.py:192-244), Shapiro-Wilk /
Wasserstein derivations (:246-330).
"""

import math

import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_grid_town, make_straight_town
from rift_tpu.scenario import TrafficEnv
from rift_tpu.scenario.criteria import (
    CBV_ACC_EDGES,
    CBV_SPEED_EDGES,
    EGO_METRIC_EDGES,
    EGO_SPEED_EDGES,
    PENALTY_COLLISION_PEDESTRIAN,
    PENALTY_COLLISION_VEHICLE,
    PENALTY_RED_LIGHT,
    PENALTY_STOP_SIGN,
    PENALTY_TIMEOUT,
    _hist_add_1d,
    _hist_add_2d,
    driving_score,
)
from rift_tpu.scenario.statistics import (
    StatisticsManager,
    metric_stats_2d,
    sample_from_hist,
    shapiro_w,
)


def test_penalty_table_math():
    """score_composed = RC x prod(penalty^count) per the leaderboard table."""
    tm = make_straight_town(length=300.0)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=0)
    state, crit, spec = env.reset()
    state, crit = env.step(state, crit)
    crit = crit.replace(
        collisions_vehicle=jnp.array([2]),
        collisions_pedestrian=jnp.array([1]),
        red_light_infractions=jnp.array([1]),
        stop_infractions=jnp.array([1]),
        timeout=jnp.array([True]),
    )
    _, _, penalty = driving_score(crit, state, spec)
    expected = (
        PENALTY_COLLISION_VEHICLE**2
        * PENALTY_COLLISION_PEDESTRIAN
        * PENALTY_RED_LIGHT
        * PENALTY_STOP_SIGN
        * PENALTY_TIMEOUT
    )
    assert abs(float(penalty[0]) - expected) < 1e-6


def test_hist_1d_binning_semantics():
    """bisect_left - 1 binning; out-of-range dropped (stat_mgr:324-335)."""
    hist = jnp.zeros((1, len(CBV_SPEED_EDGES) - 1), jnp.int32)
    vals = jnp.array([[-0.1, 0.0, 0.49, 0.5, 13.99, 14.0, 100.0]])
    mask = jnp.ones_like(vals, bool)
    out = np.asarray(_hist_add_1d(hist, CBV_SPEED_EDGES, vals, mask))[0]
    # -0.1 dropped, 0.0 -> bin0, 0.49 -> bin0, 0.5 -> bin0 (left edge),
    # 13.99 -> last bin, 14.0 and 100.0 dropped
    assert out.sum() == 4
    assert out[0] == 3
    assert out[-1] == 1


def test_hist_2d_and_metric_stats():
    hist = jnp.zeros(
        (1, len(EGO_SPEED_EDGES) - 1, len(EGO_METRIC_EDGES) - 1), jnp.int32
    )
    # ego at 7 m/s (speed bin lower edge 6 >= threshold 3), RTTC 2.2 s
    out = _hist_add_2d(
        hist, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
        jnp.array([7.0]), jnp.array([2.2]), jnp.array([True]),
    )
    # and one low-speed sample that must be excluded by the threshold
    out = _hist_add_2d(
        out, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
        jnp.array([1.0]), jnp.array([4.7]), jnp.array([True]),
    )
    mean, std = metric_stats_2d(np.asarray(out)[0], speed_threshold=3.0)
    assert abs(mean - 2.25) < 1e-6  # midpoint of the 2.0~2.5 bin
    assert std == 0.0
    # NaN metric ignored
    out2 = _hist_add_2d(
        out, EGO_SPEED_EDGES, EGO_METRIC_EDGES,
        jnp.array([7.0]), jnp.array([jnp.nan]), jnp.array([True]),
    )
    assert np.asarray(out2).sum() == np.asarray(out).sum()


def test_shapiro_and_sampling():
    # gaussian-shaped histogram over the acc bins -> W close to 1
    mids = 0.5 * (CBV_ACC_EDGES[:-1] + CBV_ACC_EDGES[1:])
    counts = np.exp(-0.5 * ((mids - 0.5) / 0.6) ** 2) * 1000
    w = shapiro_w(CBV_ACC_EDGES, counts.astype(int))
    assert 0.9 < w <= 1.0
    # degenerate histogram -> NaN
    assert math.isnan(shapiro_w(CBV_ACC_EDGES, np.zeros(len(mids))))
    s = sample_from_hist(CBV_SPEED_EDGES, np.eye(12)[3] * 50)
    assert (s >= 1.5).all() and (s <= 2.0).all()


def test_full_table_from_closed_loop(tmp_path):
    """Run a real closed loop and check every BASELINE column materialises."""
    tm = make_grid_town(blocks=2, stop_ratio=0.34)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=10, max_cbvs=2, seed=4)
    state, crit, spec = env.reset()
    for _ in range(120):
        state, crit = env.step(state, crit)
    sm = StatisticsManager(str(tmp_path / "r.json"))
    sm.register_episode(crit, state, spec)
    table = sm.compute_metric_table()
    for col in [
        "Driving Score", "Route Completion", "Infraction Penalty",
        "Ego Blocked Ratio", "ORR", "UC (%)", "CPK", "RP",
        "SW speed", "WD speed", "SW acc", "RTTC", "ACT",
    ]:
        assert col in table
    assert 0.0 <= table["Driving Score"] <= 100.0
    assert 0.0 <= table["Infraction Penalty"] <= 1.0
    # CBVs existed -> behavior aggregates are live
    if any(r.cbv_total_game_time > 0 for r in sm.records):
        assert table["RP"] >= 0.0
        assert 0.0 <= table["ORR"] <= 100.0
        assert 0.0 <= table["UC (%)"] <= 100.0
    # ego drove among traffic -> criticality histograms populated
    merged = sm._merged_ego_hist("RTTC")
    assert merged.sum() >= 0  # shape-valid
    # JSON round-trip with distributions intact
    sm2 = StatisticsManager(str(tmp_path / "r.json"), resume=True)
    assert sm2.resume_index == 2
    assert sm2.records[0].cbv_distributions.keys() == {
        "speed", "delta_speed", "target_speed", "acc", "jerk"
    }
    t2 = sm2.compute_metric_table()
    assert t2["Driving Score"] == table["Driving Score"]
