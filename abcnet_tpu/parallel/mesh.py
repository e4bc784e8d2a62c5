"""Device mesh + sharding helpers: the framework's parallelism layer.

Replaces the reference's two data-parallel mechanisms —
nn.DataParallel replicate/scatter/gather (/root/reference/src/train.py:50)
and DistributedDataParallel over NCCL with explicit all_reduce/barrier
(src/multi_gpu_train.py:44-52,114-116) — with SPMD compilation: one
`jax.jit`-compiled program over a `jax.sharding.Mesh`, batch sharded on
the 'data' axis, parameters replicated. Gradient and BatchNorm-statistic
all-reduces are inserted by XLA and ride ICI; there are no hand-written
collectives or barriers to get wrong, and (unlike the reference, which
keeps per-replica BN stats) normalization statistics are computed over
the *global* batch — SyncBN semantics for free.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`;
the same program then spans hosts with DCN-backed collectives. Nothing
else changes — that is the point of SPMD.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh):
    """Place a host batch dict on the mesh, sharded along the batch dim.

    The batch size must divide by the mesh size (the reference divides
    the global batch per process the same way, multi_gpu_train.py:51).

    Single-process: a plain sharded device_put. Multi-process (after
    jax.distributed.initialize): each process passes its PROCESS-LOCAL
    slice of the global batch — the DistributedSampler role
    (multi_gpu_train.py:62-73) — and the pieces are assembled into one
    global array spanning all hosts' devices.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    n_proc = jax.process_count()

    def put(x):
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree onto every mesh device.

    Multi-process: every process holds identical host values (same
    PRNG seed -> same init; restore loads the same checkpoint), the
    fully-replicated global array is assembled from the local copies —
    the reference ships rank-0's initial state to all ranks instead
    (multi_gpu_train2.py:91-96).
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, x.shape)

    return jax.tree_util.tree_map(put, tree)
