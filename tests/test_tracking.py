"""Experiment tracking (offline wandb equivalent) + mp4 video export."""

import json
import os

import numpy as np


def test_run_lifecycle(tmp_path):
    from rift_tpu.utils.tracking import init_run, list_runs, read_metrics

    run = init_run(
        "train_cbv", name="rift-seed0", config={"lr": 1e-4, "seed": 0},
        base_dir=str(tmp_path),
    )
    run.log({"loss": 0.5, "episode": 0})
    run.log({"loss": 0.3, "episode": 1, "driving_score": 80.0})
    run.summary["final_ds"] = 94.7
    run.finish()

    rows = list_runs(str(tmp_path))
    assert len(rows) == 1
    proj, rdir, meta, summary = rows[0]
    assert proj == "train_cbv"
    assert meta["status"] == "finished" and meta["git"]
    assert summary["loss"] == 0.3  # last value rolled up
    assert summary["driving_score"] == 80.0
    assert summary["final_ds"] == 94.7
    with open(os.path.join(rdir, "config.json")) as f:
        assert json.load(f)["lr"] == 1e-4
    metrics = read_metrics(rdir)
    assert [m["_step"] for m in metrics] == [0, 1]


def test_run_context_manager_marks_failed(tmp_path):
    import pytest

    from rift_tpu.utils.tracking import init_run, list_runs

    with pytest.raises(RuntimeError):
        with init_run("eval", base_dir=str(tmp_path)):
            raise RuntimeError("boom")
    (_, _, meta, _) = list_runs(str(tmp_path))[0]
    assert meta["status"] == "failed"


def test_runs_cli(tmp_path, capsys):
    import tools.runs as runs_cli
    from rift_tpu.utils.tracking import init_run

    for seed in (0, 1):
        r = init_run("eval", name=f"s{seed}", config={}, base_dir=str(tmp_path))
        r.log({"driving_score": 90.0 + seed})
        r.finish()
    runs_cli.main(["--base_dir", str(tmp_path), "list"])
    runs_cli.main(
        ["--base_dir", str(tmp_path), "compare", "--keys", "driving_score"]
    )
    out = capsys.readouterr().out
    assert "s0" in out and "s1" in out and "91" in out


def test_video_recorder_writes_mp4(tmp_path):
    from rift_tpu.viz.render import VideoRecorder

    rec = VideoRecorder.__new__(VideoRecorder)
    rec.out_dir = str(tmp_path)
    rec.frames = [
        (np.random.default_rng(i).integers(0, 255, (64, 64, 3))).astype(
            np.uint8
        )
        for i in range(5)
    ]
    path = rec.save("ep0")
    assert path is not None and path.endswith(".mp4")
    assert os.path.getsize(path) > 1000
    assert os.path.exists(os.path.join(tmp_path, "ep0_last.png"))
