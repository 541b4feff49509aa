"""On-device rollout buffers.

Replaces the reference's CBVRolloutBuffer / EgoRolloutBuffer
(rift/gym_carla/buffer/cbv_rollout_buffer.py): dict-of-deque trajectory
staging becomes a fixed-capacity ring of samples living in device memory, so
rollout -> train never leaves the chip. RIFT/GRPO samples are per-step
(features, behavior logits, group advantage) and independent, so they append
directly; episodic algorithms (REINFORCE/PPO) compute returns before
appending.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

DEFAULT_CAPACITY = 4096  # reference buffer cap (cbv/planning/config/rift_pluto.yaml)


@struct.dataclass
class RingBuffer:
    """Fixed-capacity FIFO over an arbitrary sample pytree."""

    data: Any  # pytree of [capacity, ...] arrays
    size: jnp.ndarray  # scalar int32
    ptr: jnp.ndarray  # scalar int32

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0]

    @property
    def full(self) -> jnp.ndarray:
        return self.size >= self.capacity


def ring_init(sample_spec: Any, capacity: int = DEFAULT_CAPACITY) -> RingBuffer:
    """`sample_spec` is a pytree of ShapeDtypeStruct-like objects (or arrays)
    describing ONE sample."""

    def alloc(x):
        shape = getattr(x, "shape", ())
        dtype = getattr(x, "dtype", jnp.float32)
        return jnp.zeros((capacity,) + tuple(shape), dtype)

    return RingBuffer(
        data=jax.tree.map(alloc, sample_spec),
        size=jnp.zeros((), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )


@jax.jit
def ring_append(buf: RingBuffer, samples: Any, valid: jnp.ndarray) -> RingBuffer:
    """Append up to n samples (leading dim n, `valid` selects real ones)."""
    capacity = buf.capacity
    n = valid.shape[0]
    # slot for each sample: ptr + (#valid before it); invalid -> huge (dropped)
    offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slots = jnp.where(valid, (buf.ptr + offsets) % capacity, capacity + n)

    def scatter(dst, src):
        return dst.at[slots].set(src, mode="drop")

    new_data = jax.tree.map(scatter, buf.data, samples)
    added = valid.sum().astype(jnp.int32)
    return RingBuffer(
        data=new_data,
        size=jnp.minimum(buf.size + added, capacity),
        ptr=(buf.ptr + added) % capacity,
    )


def ring_reset(buf: RingBuffer) -> RingBuffer:
    return RingBuffer(
        data=buf.data, size=jnp.zeros((), jnp.int32), ptr=jnp.zeros((), jnp.int32)
    )


def sample_batches(buf: RingBuffer, rng: jax.Array, batch_size: int, num_batches: int):
    """Shuffled batch indices for one epoch over the filled region.

    When the buffer holds a full epoch, indices are a without-replacement
    permutation (the reference's shuffled dataloader semantics,
    fine_tuner/rlft/rift_pluto/rift_datamodule.py); otherwise samples are
    drawn with replacement. Host-side call (concrete `buf.size`).
    """
    total = num_batches * batch_size
    size = int(buf.size)
    if size >= total:
        idx = jax.random.permutation(rng, size)[:total]
    else:
        idx = jax.random.randint(rng, (total,), 0, max(size, 1))
    return idx.reshape(num_batches, batch_size)


def gather_batch(buf: RingBuffer, idx: jnp.ndarray):
    return jax.tree.map(lambda x: x[idx], buf.data)
