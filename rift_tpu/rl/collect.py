"""Offline dataset collection -> HDF5.

Counterpart of the reference's CollectBuffer
(rift/gym_carla/buffer/collect_buffer.py:130-182: per-episode trajectories
with inverse-converted actions saved to `{ego}_{cbv}.hdf5`, camera frames as
PNGs). Here the collected streams are SimState snapshots and the applied
controls/inverse actions; BEV frames come from viz.render when requested.
"""

from __future__ import annotations

import os

import numpy as np

from .classic import control_to_rl_action


class CollectBuffer:
    def __init__(self, out_dir: str, ego_name: str = "pdm_lite", cbv_name: str = "standard"):
        self.out_dir = out_dir
        self.name = f"{ego_name}_{cbv_name}"
        self.frames: list[dict] = []
        os.makedirs(out_dir, exist_ok=True)

    @property
    def h5_path(self) -> str:
        return os.path.join(self.out_dir, f"{self.name}.hdf5")

    def exists(self) -> bool:
        """Skip-existing resume semantics (carla_runner.py:535-553)."""
        return os.path.exists(self.h5_path)

    def store(self, state, extra: dict | None = None):
        rec = {
            "pos": np.asarray(state.pos),
            "heading": np.asarray(state.heading),
            "speed": np.asarray(state.speed),
            "shape": np.asarray(state.shape),
            "control": np.asarray(state.control),
            "rl_action": np.asarray(control_to_rl_action(state.control)),
            "alive": np.asarray(state.alive),
            "is_cbv": np.asarray(state.is_cbv),
            "collision": np.asarray(state.collision),
            "ego_route_cursor": np.asarray(state.ego_route_cursor),
            "tick": np.asarray(state.tick),
        }
        if extra:
            rec.update({k: np.asarray(v) for k, v in extra.items()})
        self.frames.append(rec)

    def set_static(self, static: dict):
        """Episode-static arrays saved once (e.g. the ego route — needed
        to rebuild PlanT tokens offline, models/plant/train.py)."""
        self._static = {k: np.asarray(v) for k, v in static.items()}

    def save(self) -> str:
        import h5py

        # never create/truncate on an empty buffer: exists()-based resume
        # would then permanently skip re-collecting this ego/cbv pair
        if not self.frames:
            return self.h5_path
        with h5py.File(self.h5_path, "w") as f:
            keys = self.frames[0].keys()
            for k in keys:
                data = np.stack([fr[k] for fr in self.frames])
                f.create_dataset(k, data=data, compression="gzip")
            for k, v in getattr(self, "_static", {}).items():
                f.create_dataset(f"static_{k}", data=v, compression="gzip")
            f.attrs["num_ticks"] = len(self.frames)
        self.frames = []
        return self.h5_path

    @staticmethod
    def load(path: str) -> dict[str, np.ndarray]:
        import h5py

        with h5py.File(path, "r") as f:
            return {k: f[k][:] for k in f.keys()}
