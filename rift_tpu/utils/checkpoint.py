"""Checkpoint / resume.

Counterpart of the reference's Lightning ckpt round-trips
(fine_tuner/training_builder.py:131-140 "carla_episode={N}-..." naming,
rlft_pluto.py:249-293 latest-episode discovery) and classic-PPO torch saves
(rl/ppo.py). Uses orbax for the param pytrees; episode-indexed directories
allow train resume by latest episode.
"""

from __future__ import annotations

import os
import re

import orbax.checkpoint as ocp

EP_RE = re.compile(r"episode_(\d+)$")


class CheckpointManager:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, params, episode: int, name: str = "model"):
        path = os.path.join(self.root, f"{name}-episode_{episode}")
        self._ckpt.save(path, params, force=True)
        self._ckpt.wait_until_finished()
        return path

    def latest_episode(self, name: str = "model") -> int | None:
        eps = []
        for d in os.listdir(self.root):
            if d.startswith(f"{name}-"):
                m = EP_RE.search(d)
                if m:
                    eps.append(int(m.group(1)))
        return max(eps) if eps else None

    def restore(self, template, episode: int | None = None, name: str = "model"):
        """Restore params matching `template`'s pytree structure. Episode
        defaults to the latest. Returns (params, episode) or (None, None)."""
        if episode is None:
            episode = self.latest_episode(name)
        if episode is None:
            return None, None
        path = os.path.join(self.root, f"{name}-episode_{episode}")
        params = self._ckpt.restore(path, template)
        return params, episode
