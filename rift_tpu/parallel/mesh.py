"""Mesh + sharding helpers.

The reference scales by running independent single-GPU processes on distinct
CARLA ports (README.md:144-149) and has no distributed backend in the core
(SURVEY.md §2.8). Here scale-out is one SPMD program: a 1-D `scenario` mesh
axis shards the scenario/batch dimension of every rollout and training
tensor; params are replicated; gradient reduction is the psum XLA inserts.
A dim-128 planner needs no tensor/pipeline parallelism — the parallel axis
that matters is scenarios x CBVs x candidates.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "scenario"):
    """Shard every leaf's leading dim across the mesh axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
