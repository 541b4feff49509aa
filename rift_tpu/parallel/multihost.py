"""Multi-host (DCN) scale-out.

The reference scales by launching independent single-GPU processes on
distinct CARLA ports (README.md:144-149) — results are merged offline by
scripts/merge_statistics.py. The TPU-native equivalent is one SPMD program
over a multi-host mesh: every host runs the same jitted step, the
`scenario` axis is sharded across ALL devices of ALL hosts, gradient
psums ride ICI within a slice and DCN across slices — XLA inserts the
collectives, the runtime picks the transport.

Usage (one call per process, before any jax op):

    from rift_tpu.parallel import init_distributed, global_mesh
    init_distributed()           # no-op single-host; env-driven multi-host
    mesh = global_mesh()         # 1-D scenario mesh over all global devices

Per-host data (each host simulates its own scenario shard) becomes one
global array via `host_local_batch` (jax.make_array_from_process_local_data
— no host ever materialises the full batch, the DCN-correct pattern).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-host runtime. Returns True if distributed mode is on.

    Explicit args win; otherwise RIFT_COORDINATOR / RIFT_NUM_PROCESSES /
    RIFT_PROCESS_ID env vars; otherwise jax.distributed's own autodetection
    for TPU pods (GCE metadata) when JAX_COORDINATOR_ADDRESS is set. With
    none of these the process stays single-host and this is a no-op.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "RIFT_COORDINATOR"
    )
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    if num_processes is None and os.environ.get("RIFT_NUM_PROCESSES"):
        num_processes = int(os.environ["RIFT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("RIFT_PROCESS_ID"):
        process_id = int(os.environ["RIFT_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def global_mesh(axis: str = "scenario") -> Mesh:
    """1-D mesh over every device of every process (DP over scenarios —
    the only parallel axis this workload needs, SURVEY §2.8)."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_batch(tree, mesh: Mesh, axis: str = "scenario"):
    """Assemble a GLOBAL batch from each process's LOCAL shard.

    Every process passes only the scenarios it simulates; the returned
    jax.Arrays are globally sharded over `axis` without any host ever
    gathering the full batch (multi-host jax.Array construction via
    make_array_from_process_local_data)."""

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree.map(put, tree)


def replicate_global(tree, mesh: Mesh):
    """Fully-replicated global arrays from identical per-process values
    (maps, specs, params): every process passes the same full array."""

    def put(x):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)
        )

    return jax.tree.map(put, tree)
