"""Statistics manager: leaderboard records, aggregation, resume.

Host-side counterpart of rift/scenario/statistics_manager.py: per-route
records with score_composed = route_completion x infraction penalty
(:466-556), global aggregation with CBV behavior statistics (:558-789), and
resume-safe JSON checkpointing (:790-838). Numbers come off the device once
per episode, not per tick.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np

from ..sim.state import ScenarioSpec, SimState
from .criteria import CriteriaState, driving_score, route_completion_percent


@dataclass
class RouteRecord:
    route_id: str
    index: int
    status: str = "Completed"
    driving_score: float = 0.0
    route_completion: float = 0.0
    infraction_penalty: float = 1.0
    collisions_vehicle: int = 0
    red_light: int = 0
    stop_infraction: int = 0
    blocked: bool = False
    route_deviation: bool = False
    timeout: bool = False
    route_length_m: float = 0.0
    duration_ticks: int = 0
    # CBV behavior
    cbv_mean_speed: float = 0.0
    cbv_mean_abs_acc: float = 0.0
    cbv_mean_abs_jerk: float = 0.0
    cbv_offroad_ratio: float = 0.0
    cbv_uncomfortable_ratio: float = 0.0
    cbv_collisions: int = 0
    cbv_route_progress_m: float = 0.0


@dataclass
class GlobalStats:
    total_routes: int = 0
    avg_driving_score: float = 0.0
    avg_route_completion: float = 0.0
    avg_infraction_penalty: float = 1.0
    ego_blocked_ratio: float = 0.0
    collisions_per_km: float = 0.0
    route_progress_m: float = 0.0
    cbv_uncomfortable_pct: float = 0.0
    cbv_mean_speed: float = 0.0


class StatisticsManager:
    def __init__(self, checkpoint_path: str | None = None, resume: bool = False):
        """Records load from `checkpoint_path` only when `resume` is set
        (the reference gates resume explicitly, carla_runner.py:513-527);
        otherwise a stale results file is overwritten at the first save."""
        self.records: list[RouteRecord] = []
        self.checkpoint_path = checkpoint_path
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            self._load()

    # ------------------------------------------------------------------
    def register_episode(
        self,
        crit: CriteriaState,
        state: SimState,
        spec: ScenarioSpec,
        route_ids: list[str] | None = None,
    ):
        """Pull one batch of finished scenarios into records."""
        ds, rc, penalty = driving_score(crit, state, spec)
        ds, rc, penalty = map(np.asarray, (ds, rc, penalty))
        S = ds.shape[0]
        c = crit
        for s in range(S):
            n = max(int(c.cbv_count[s]), 1)
            ticks = max(int(c.done_tick[s]) or int(state.tick[s]), 1)
            rec = RouteRecord(
                route_id=(route_ids[s] if route_ids else f"route_{len(self.records)}"),
                index=len(self.records),
                status="Completed" if bool(c.route_complete[s]) else (
                    "Blocked" if bool(c.blocked[s]) else (
                        "Deviated" if bool(c.route_deviation[s]) else (
                            "Timeout" if bool(c.timeout[s]) else "Incomplete"
                        )
                    )
                ),
                driving_score=float(ds[s]),
                route_completion=float(rc[s]),
                infraction_penalty=float(penalty[s]),
                collisions_vehicle=int(c.collisions_vehicle[s]),
                red_light=int(c.red_light_infractions[s]),
                stop_infraction=int(c.stop_infractions[s]),
                blocked=bool(c.blocked[s]),
                route_deviation=bool(c.route_deviation[s]),
                timeout=bool(c.timeout[s]),
                route_length_m=float(spec.ego_route_len[s]),
                duration_ticks=ticks,
                cbv_mean_speed=float(c.cbv_speed_sum[s]) / n,
                cbv_mean_abs_acc=float(c.cbv_acc_sum[s]) / n,
                cbv_mean_abs_jerk=float(c.cbv_jerk_sum[s]) / n,
                cbv_offroad_ratio=float(c.cbv_offroad_ticks[s]) / n,
                cbv_uncomfortable_ratio=float(c.cbv_uncomfortable_ticks[s]) / n,
                cbv_collisions=int(c.cbv_collisions[s]),
                cbv_route_progress_m=float(state.ego_route_cursor[s]),
            )
            self.records.append(rec)
        if self.checkpoint_path:
            self.save()

    # ------------------------------------------------------------------
    def compute_global_statistics(self) -> GlobalStats:
        if not self.records:
            return GlobalStats()
        r = self.records
        n = len(r)
        driven_km = sum(x.cbv_route_progress_m for x in r) / 1000.0
        return GlobalStats(
            total_routes=n,
            avg_driving_score=float(np.mean([x.driving_score for x in r])),
            avg_route_completion=float(np.mean([x.route_completion for x in r])),
            avg_infraction_penalty=float(np.mean([x.infraction_penalty for x in r])),
            ego_blocked_ratio=100.0 * sum(x.blocked for x in r) / n,
            collisions_per_km=(
                sum(x.collisions_vehicle for x in r) / max(driven_km, 1e-6)
            ),
            route_progress_m=float(np.mean([x.cbv_route_progress_m for x in r])),
            cbv_uncomfortable_pct=100.0
            * float(np.mean([x.cbv_uncomfortable_ratio for x in r])),
            cbv_mean_speed=float(np.mean([x.cbv_mean_speed for x in r])),
        )

    # ------------------------------------------------------------------
    def save(self, path: str | None = None):
        path = path or self.checkpoint_path
        if not path:
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "progress": [len(self.records), len(self.records)],
            "records": [asdict(x) for x in self.records],
            "global": asdict(self.compute_global_statistics()),
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)

    def _load(self):
        with open(self.checkpoint_path) as f:
            payload = json.load(f)
        self.records = [RouteRecord(**x) for x in payload.get("records", [])]

    @property
    def resume_index(self) -> int:
        return len(self.records)
