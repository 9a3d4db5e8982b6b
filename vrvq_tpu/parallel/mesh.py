"""Device mesh + sharding helpers for data-parallel training/eval.

The reference's only parallelism is DDP over NCCL (SURVEY §2: torch DDP via
audiotools Accelerator, scripts/train.py:43,181-182). TPU-native equivalent:
a 1-D ``data`` mesh; batches are sharded over it, params/opt-state are
replicated, and gradient psums ride the ICI — all inserted by XLA from the
shardings, no hand-written collectives. Multi-host extends the same mesh
over DCN via jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every leaf's batch axis over the mesh.

    Single-host: a plain device_put of the global array. Multi-host: each
    process passes only its LOCAL rows (the trainer's ``local_slice``
    loader) and the global sharded array is assembled from the
    per-process shards without any cross-host data movement — the
    torch-DDP per-rank-sampler equivalent (reference scripts/train.py:
    452-467), except the "gather" is purely logical."""
    sharding = batch_sharding(mesh, axis_name)
    multihost = jax.process_count() > 1

    def put(x):
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    assert global_batch_size % n == 0, (
        f"batch size {global_batch_size} not divisible by {n} devices"
    )
    return global_batch_size // n


def zero_shard_opt_state(opt_state, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-style optimizer-state sharding over the data axis.

    The reference shards AdamW state across DDP ranks via torch's
    ZeroRedundancyOptimizer (scripts/train.py:185-188). Equivalent here:
    every optimizer-state leaf whose leading dim divides the mesh size is
    sharded over ``data``; XLA then keeps Adam moments distributed and
    all-gathers only what each update needs over ICI. Params stay
    replicated. Scalar leaves (step counts) stay replicated too.
    """
    n = mesh.devices.size
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, opt_state)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) rendezvous — the torchrun/MASTER_ADDR equivalent
    (reference: scripts/script_train.sh:33)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
