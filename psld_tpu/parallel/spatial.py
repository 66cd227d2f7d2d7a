"""Spatial (activation) parallelism: shard the image HEIGHT axis over a
``spatial`` mesh axis.

Data parallelism stops helping once a single sample's activations dominate
HBM — the regime the reference's high-resolution configs head toward
(afhqv2 128x128; the PSLD paper's CelebA-HQ-256 runs) and where its DDP
strategy (reference main/train_sde.py:114, one sample per GPU minimum) hits
a wall: DDP cannot split ONE image across devices. On TPU the natural
answer is SPMD spatial partitioning: annotate the batch as
``P("data", "spatial")`` (NHWC, height sharded) and let XLA's partitioner
insert the halo exchanges every convolution needs at shard boundaries —
nearest-neighbor ICI traffic, no hand-written collectives. Verified
numerically against unsharded execution (tests/test_spatial.py), including
the FIR up/down-sampling paths (strided + lhs-dilated convs) and
global-reduction normalizations.

Mesh layout: devices reshape to ``(data, spatial)`` with CONSECUTIVE
devices forming a spatial group, so halo exchanges (every conv, every
layer) ride adjacent ICI links while the once-per-step gradient all-reduce
crosses groups. Composes with FSDP (params shard over ``data``, see
``parallel/fsdp.py``) and with multi-step dispatch ([K, B, H, W, C] inputs,
``batch_axis=1``).

Constraints: the INPUT height must divide by the spatial factor (interior
layers may reshard freely — XLA pads internally); attention layers at
sharded resolutions gather their tokens (attention is global), which XLA
derives from the same annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(spatial: int, devices=None,
                      axes=("data", "spatial")) -> Mesh:
    """2-D ``(data, spatial)`` mesh; consecutive devices share a spatial
    group (halo exchanges stay on adjacent ICI links)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if spatial < 1 or n % spatial:
        raise ValueError(
            f"spatial={spatial} must divide the device count {n} "
            "(training.spatial / evaluation.spatial)")
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, axes)


def spatial_batch_spec(batch_axis: int = 0, data_axis: str = "data",
                       spatial_axis: str = "spatial") -> P:
    """PartitionSpec for an [..., B, H, W, C] batch: ``data`` on the batch
    axis, ``spatial`` on the height axis immediately after it."""
    lead = (None,) * batch_axis
    return P(*lead, data_axis, spatial_axis)


def spatial_batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    return NamedSharding(mesh, spatial_batch_spec(batch_axis))


def check_divisible(height: int, mesh: Mesh,
                    spatial_axis: str = "spatial") -> None:
    s = int(mesh.shape[spatial_axis])
    if height % s:
        raise ValueError(
            f"image height {height} is not divisible by the spatial mesh "
            f"factor {s}; pick training.spatial from the divisors of the "
            f"input resolution")
