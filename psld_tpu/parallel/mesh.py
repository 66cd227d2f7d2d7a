"""Device mesh and sharding utilities.

TPU-native replacement for the reference's Lightning DDP/NCCL distribution
(train_sde.py:114, SURVEY.md section 2.3): a 1-D ``data`` mesh over all
devices; parameters/optimizer/EMA replicated, batches sharded on the leading
axis. Gradient reduction is inserted by XLA (jit + shardings) and rides ICI.
Extra axes (``model`` for tensor-parallel experiments) can be added without
touching the train step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data",
                   batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis (by default the leading one) across the mesh."""
    return NamedSharding(mesh, P(*((None,) * batch_axis), axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data",
                batch_axis: int = 0, sharding: NamedSharding | None = None):
    """Place a host array onto the mesh, sharded along the batch axis
    (``batch_axis=1`` for step-stacked [K, B, ...] multi-dispatch inputs).
    Pass ``sharding`` to override the placement entirely (e.g. the 2-D
    batch+height layout of ``parallel/spatial.py``).

    Multi-host: each process passes only its local slice of the global
    batch (see ``distributed.local_batch_slice``); the slices are assembled
    into one global array without cross-host transfers."""
    if sharding is None:
        sharding = batch_sharding(mesh, axis_name, batch_axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a (host-identical) pytree across the mesh. Multi-host:
    every process holds the full value (same-seed init / same checkpoint),
    so the fully-replicated global array is assembled process-locally."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
