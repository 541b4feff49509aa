"""Logging & observability.

Covers the reference's logging surfaces (rift/util/logger.py colored stdout,
route_info.txt episodic rewards, statistics_manager.py:306-423
live_results.txt, wandb-offline metric streams): colored console logger, a
JSONL metric stream (wandb is not in this image — the JSONL is sync-able),
and the live results text dump. Also a phase timer for profiling
(SURVEY.md §5: the reference has no profiler integration; this is
greenfield).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager

COLORS = {
    "red": "\033[91m", "green": "\033[92m", "yellow": "\033[93m",
    "blue": "\033[94m", "magenta": "\033[95m", "cyan": "\033[96m",
    "reset": "\033[0m",
}


class Logger:
    def __init__(self, out_dir: str | None = None, name: str = "rift_tpu"):
        self.name = name
        self.out_dir = out_dir
        self._metrics_f = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._metrics_f = open(os.path.join(out_dir, "metrics.jsonl"), "a")

    def log(self, msg: str, color: str = "reset"):
        print(f"{COLORS.get(color, '')}[{self.name}] {msg}{COLORS['reset']}")

    def log_metrics(self, step: int, **metrics):
        if self._metrics_f:
            self._metrics_f.write(
                json.dumps({"step": step, "time": time.time(), **metrics}) + "\n"
            )
            self._metrics_f.flush()

    def write_live_results(self, text: str):
        if self.out_dir:
            with open(os.path.join(self.out_dir, "live_results.txt"), "w") as f:
                f.write(text)

    def write_route_info(self, episode: int, rewards: dict):
        if self.out_dir:
            with open(os.path.join(self.out_dir, "route_info.txt"), "a") as f:
                f.write(f"episode {episode}: {json.dumps(rewards)}\n")


class PhaseTimer:
    """Wall-clock per phase (reset/rollout/train/...); host-side."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {"total_s": round(v, 3), "count": self.counts[k],
                "mean_ms": round(1000 * v / max(self.counts[k], 1), 2)}
            for k, v in self.totals.items()
        }
