"""Top-level runner: mode dispatch and the rollout/train alternation.

Counterpart of rift/carla_runner.py:410-487 (modes train_cbv / eval /
collect_data) without the CARLA process management: the "world" is the jitted
env_step, so a runner owns (map, env, policies, buffer, statistics) and loops
episodes. The reference's train loop — fill a 4096-step buffer, fit 16
epochs, swap weights, reset buffer (rlft_pluto.py:206-247) — becomes
buffer-full -> rl.trainer.fit -> params assignment, all on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .map.tensor_map import TensorMap
from .models.pluto import PlutoModel, build_cbv_features
from .models.pluto.policy import pluto_cbv_act
from .rl import (
    TrainConfig,
    fit,
    rift_loss,
    ring_append,
    ring_init,
    ring_reset,
)
from .scenario import TrafficEnv, cbv_slot_assignment
from .scenario.statistics import StatisticsManager


@dataclass
class RunnerConfig:
    num_scenarios: int = 4
    num_agents: int = 16
    max_cbvs: int = 3
    max_episode_ticks: int = 600
    buffer_capacity: int = 1024
    train: TrainConfig = field(default_factory=TrainConfig)
    seed: int = 0
    encoder_depth: int = 4
    decoder_depth: int = 4
    # data-parallel over the scenario axis on every visible device (SPMD:
    # params replicated, rollout + train batches sharded, grad psum by XLA)
    shard: bool = True
    # frame-invariant token mode (see models/pluto/features.py): encoders
    # run once per world agent / map lane instead of once per CBV view
    canonical: bool = False


class Runner:
    def __init__(self, tmap: TensorMap, cfg: RunnerConfig | None = None):
        self.cfg = cfg or RunnerConfig()
        self.tmap = tmap
        self.env = TrafficEnv(
            tmap,
            num_scenarios=self.cfg.num_scenarios,
            num_agents=self.cfg.num_agents,
            max_cbvs=self.cfg.max_cbvs,
            seed=self.cfg.seed,
        )
        self.model = PlutoModel(
            encoder_depth=self.cfg.encoder_depth,
            decoder_depth=self.cfg.decoder_depth,
        )
        self.params: Any = None
        self.buffer = None
        self.stats = StatisticsManager()
        self.train_rounds = 0
        self.rng = jax.random.PRNGKey(self.cfg.seed)
        self.mesh = None
        if self.cfg.shard and len(jax.devices()) > 1:
            n = len(jax.devices())
            if self.cfg.num_scenarios % n == 0:
                from .parallel import make_mesh, replicate

                self.mesh = make_mesh(n)
                self.tmap = replicate(self.tmap, self.mesh)
                self.env.tmap = self.tmap

    def _shard_scenario(self, tree):
        """Shard a leading-[S] pytree across the scenario mesh axis."""
        if self.mesh is None:
            return tree
        from .parallel import shard_batch

        return shard_batch(tree, self.mesh)

    # ------------------------------------------------------------------
    def init_params(self):
        state, crit, spec = self.env.reset()
        slots = cbv_slot_assignment(state.is_cbv, self.cfg.max_cbvs)
        if self.cfg.canonical:
            feats, _, shared = build_cbv_features(
                self.tmap, state, slots, spec, canonical=True
            )
        else:
            feats, _ = build_cbv_features(self.tmap, state, slots, spec)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
        if self.cfg.canonical:
            S, C = slots.shape
            flat = dict(flat)
            flat["shared"] = {**shared, "scen_idx": jnp.repeat(jnp.arange(S), C)}
        self.rng, k = jax.random.split(self.rng)
        # init on CPU: flax init is a huge one-shot graph; compiling it on
        # the TPU costs minutes (see utils/cache.py)
        from .utils.cache import init_params_on_cpu

        self.params = init_params_on_cpu(self.model.init, k, flat)
        if self.mesh is not None:
            from .parallel import replicate

            self.params = replicate(self.params, self.mesh)
        self._feat_template = jax.tree.map(lambda x: x[0, 0], feats)
        state = self._shard_scenario(state)
        crit = self._shard_scenario(crit)
        self.env.spec = spec = self._shard_scenario(spec)
        return state, crit, spec

    SAMPLE_KEYS = (
        "old_logits", "advantage", "valid", "rollout_return", "chosen_idx",
        "teacher_speed", "teacher_pos", "value", "reward", "ret",
        "ret_shaped", "gae", "gae_valid",
    )

    # ------------------------------------------------------------------
    def run_episode(self, train: bool = False, collect=None, chunk: int = 10):
        """One batched episode. Returns (state, crit, spec).

        Ticks run in fused `chunk`-step device programs (rollout.rollout_chunk)
        unless a per-step `collect` callback needs intermediate states.
        """
        if self.params is None:
            state, crit, spec = self.init_params()
        else:
            state, crit, spec = self.env.reset()
            state = self._shard_scenario(state)
            crit = self._shard_scenario(crit)
            self.env.spec = spec = self._shard_scenario(spec)

        if collect is not None:
            from .rollout import flush_pending, tick_extras

            pending = []
            for _ in range(self.cfg.max_episode_ticks):
                res = pluto_cbv_act(
                    self.model, self.params, self.tmap, spec, state,
                    max_cbvs=self.cfg.max_cbvs, train=train,
                    canonical=self.cfg.canonical,
                    map_tok=self._map_tokens(),
                )
                collect(state, res)
                state, crit = self.env.step(
                    state, crit, cbv_traj=res["traj"], cbv_traj_mask=res["mask"]
                )
                if train and bool(res["mask"].any()):
                    pending.append(tick_extras(self.tmap, res, state, crit))
                    if len(pending) >= 16:
                        flush_pending(self._store_chunk_flat, pending)
                if self.env.all_done(crit):
                    break
            if train:
                flush_pending(self._store_chunk_flat, pending)
        else:
            from .rollout import rollout_chunk

            n_chunks = max(self.cfg.max_episode_ticks // chunk, 1)
            for _ in range(n_chunks):
                state, crit, extras = rollout_chunk(
                    self.model, self.params, self.tmap, spec, state, crit,
                    max_cbvs=self.cfg.max_cbvs, num_steps=chunk, train=train,
                    canonical=self.cfg.canonical,
                    map_tok=self._map_tokens(),
                )
                if train and extras is not None:
                    self._store_chunk(extras)
                if self.env.all_done(crit):
                    break
        self.stats.register_episode(crit, state, spec)
        return state, crit, spec

    def _map_tokens(self):
        """Canonical per-lane map tokens cached per (params, tmap) — see
        PlutoPolicy.map_tokens: the map PointsEncoder runs once per
        param/map change instead of once per tick."""
        if not self.cfg.canonical or self.params is None:
            return None
        src = (self.params, self.tmap)
        if not all(
            a is b
            for a, b in zip(getattr(self, "_map_tok_src", (None, None)), src)
        ):
            from .models.pluto.policy import canonical_map_tokens

            self._map_tok = canonical_map_tokens(
                self.model, self.params, self.tmap
            )
            self._map_tok_src = src
        return self._map_tok

    def _store_chunk(self, extras):
        """Append [K, B, ...] stacked chunk samples to the ring buffer."""
        merge = lambda x: x.reshape((-1,) + x.shape[2:])
        samples = {"features": jax.tree.map(merge, extras["features"])}
        for k in self.SAMPLE_KEYS:
            if k in extras:
                samples[k] = merge(extras[k])
        if self.buffer is None:
            spec = jax.tree.map(lambda x: x[0], samples)
            self.buffer = ring_init(spec, capacity=self.cfg.buffer_capacity)
        self.buffer = ring_append(
            self.buffer, samples, merge(extras["sample_valid"])
        )

    _store_chunk_flat = _store_chunk  # flush_pending callback alias

    # ------------------------------------------------------------------
    def train_cbv(self, num_episodes: int = 10):
        """The flagship mode: closed-loop RIFT fine-tuning."""
        losses_log = []
        for ep in range(num_episodes):
            self.run_episode(train=True)
            if self.buffer is not None and bool(self.buffer.full):
                self.rng, k = jax.random.split(self.rng)
                self.params, losses = fit(
                    self.params, self.buffer, self._rift_loss_fn,
                    self.cfg.train, k, round_idx=self.train_rounds,
                    mesh=self.mesh,
                )
                self.train_rounds += 1
                self.buffer = ring_reset(self.buffer)
                losses_log.append(losses)
        return losses_log

    def _rift_loss_fn(self, params, batch, rng):
        out = self.model.apply(params, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        return rift_loss(
            out["probability"], r_pad, batch["old_logits"],
            batch["advantage"], batch["valid"],
        )

    # ------------------------------------------------------------------
    def eval(self, num_episodes: int = 3):
        for _ in range(num_episodes):
            self.run_episode(train=False)
        return self.stats.compute_global_statistics()

    # ------------------------------------------------------------------
    def collect_data(self, num_episodes: int = 1):
        """Offline dataset collection (reference collect_data mode,
        carla_runner.py:364-408): returns a list of per-tick dicts with
        ego/CBV states for SFT or recognition training."""
        dataset = []

        def collect(state, res):
            dataset.append(
                {
                    "pos": np.asarray(state.pos),
                    "heading": np.asarray(state.heading),
                    "speed": np.asarray(state.speed),
                    "is_cbv": np.asarray(state.is_cbv),
                    "alive": np.asarray(state.alive),
                    "cbv_traj": np.asarray(res["traj"]),
                }
            )

        for _ in range(num_episodes):
            self.run_episode(train=False, collect=collect)
        return dataset
