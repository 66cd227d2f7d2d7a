"""ZeRO-style fully-sharded data parallelism (FSDP) over a mesh axis.

The reference's only distribution strategy is DDP with fully replicated
parameters (reference main/train_sde.py:114); at its model scale (<=100M
params) replication is fine for throughput but bounds the per-chip batch —
the remat measurements showed the bs256 train step needs 17 GB of HBM on a
16 GB v5e chip, most of it parameters + Adam moments + EMA held three times
over. FSDP shards every large parameter / EMA / optimizer-moment leaf
across a mesh axis; XLA's SPMD partitioner derives the all-gathers
(forward/backward) and reduce-scatters (gradients) from the sharding
annotations alone — the TPU-native equivalent of ZeRO-3, with no wrapper
modules and no hand-written collectives.

Two layouts are supported through the same functions:

- 1-D ``data`` axis: classic ZeRO — the batch and the parameters shard over
  the same axis (``axis_name="data"``).
- 2-D ``(data, model)`` hybrid: batch on ``data``, parameters on ``model``
  — all-gathers stay inside the smaller ``model`` group (e.g. one ICI ring)
  while gradients still all-reduce over ``data``.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this many elements stay replicated: gathering a tiny
# bias costs more in collective latency than its replication costs in HBM.
DEFAULT_MIN_SIZE = 2 ** 14


def fsdp_spec(shape, n_shards: int, axis_name: str = "data",
              min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec sharding the largest ``n_shards``-divisible dim.

    Scalars, small leaves (< ``min_size`` elements), and leaves with no
    divisible dimension are replicated. Ties prefer the trailing dimension
    (conv HWIO output features / dense columns — the natural reduce-scatter
    axis for their gradients).
    """
    if not shape or math.prod(shape) < max(min_size, 2):
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n_shards == 0 and (best is None or d >= shape[best]):
            best = i
    if best is None:
        return P()
    return P(*[axis_name if i == best else None for i in range(len(shape))])


def tree_shardings(tree, mesh: Mesh, axis_name: str = "data",
                   min_size: int = DEFAULT_MIN_SIZE):
    """Per-leaf NamedShardings for an FSDP placement of ``tree``.

    Works on any pytree of arrays/ShapeDtypeStructs — params, a whole
    TrainState (step scalar and optimizer ``count`` leaves come out
    replicated), or gradients (same tree as params).
    """
    n = int(mesh.shape[axis_name])
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, fsdp_spec(np.shape(leaf), n, axis_name, min_size)),
        tree,
    )


def shard_tree(tree, mesh: Mesh, axis_name: str = "data",
               min_size: int = DEFAULT_MIN_SIZE):
    """Place ``tree`` onto ``mesh`` with FSDP shardings.

    Multi-host: every process holds the full (host-identical) value — same
    seed init or same restored checkpoint — so each host hands XLA just its
    slice via ``make_array_from_callback`` (no cross-host transfers).
    """
    shardings = tree_shardings(tree, mesh, axis_name, min_size)

    def put(x, sharding):
        if jax.process_count() > 1:
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree, shardings)


def per_device_bytes(tree) -> int:
    """Bytes of ``tree`` resident on one device (max across devices) —
    the HBM footprint FSDP is meant to shrink."""
    totals: dict[int, int] = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        for shard in leaf.addressable_shards:
            d = shard.device.id
            totals[d] = totals.get(d, 0) + int(
                math.prod(shard.data.shape) * leaf.dtype.itemsize)
    return max(totals.values()) if totals else 0
