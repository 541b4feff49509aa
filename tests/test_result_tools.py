"""merge_statistics / check_eval result tooling (reference scripts/)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rift_tpu.map import make_straight_town
from rift_tpu.scenario import TrafficEnv
from rift_tpu.scenario.statistics import StatisticsManager


@pytest.fixture(scope="module")
def seed_runs(tmp_path_factory):
    """Two seeds of a tiny eval, laid out like run.py's out_dir scheme."""
    base = tmp_path_factory.mktemp("eval")
    tm = make_straight_town(length=300.0, num_lanes=2)
    for seed in (0, 1):
        env = TrafficEnv(tm, num_scenarios=2, num_agents=6, seed=seed)
        state, crit, spec = env.reset()
        for _ in range(40):
            state, crit = env.step(state, crit)
        d = base / f"pdm_lite-rift_pluto-seed{seed}"
        d.mkdir()
        sm = StatisticsManager(str(d / "simulation_results.json"))
        sm.register_episode(crit, state, spec)
    return str(base)


def test_merge_statistics(seed_runs, capsys):
    import merge_statistics

    runs = merge_statistics.find_seed_runs(seed_runs)
    assert list(runs) == ["pdm_lite-rift_pluto"]
    assert sorted(runs["pdm_lite-rift_pluto"]) == [0, 1]
    out = str(os.path.join(seed_runs, "merged.json"))
    results = merge_statistics.main(["--base_dir", seed_runs, "--out", out])
    row = results["pdm_lite-rift_pluto"]
    assert "Driving Score" in row and "±" in row["Driving Score"]
    assert os.path.exists(out)
    with open(out) as f:
        assert "pdm_lite-rift_pluto" in json.load(f)


def test_check_eval_passes_and_fails(seed_runs):
    import check_eval

    n = check_eval.main(["--base_dir", seed_runs, "--expected_routes", "2"])
    assert n == 2
    # corrupt one file -> non-zero exit
    bad = os.path.join(
        seed_runs, "pdm_lite-rift_pluto-seed0", "simulation_results.json"
    )
    with open(bad) as f:
        data = json.load(f)
    data["records"][0]["driving_score"] = 250.0
    with open(bad, "w") as f:
        json.dump(data, f)
    with pytest.raises(SystemExit):
        check_eval.main(["--base_dir", seed_runs])
