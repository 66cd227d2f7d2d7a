"""Host-side input pipeline.

Reference parity (train_sde.py:100-110): shuffle=True, drop_last=True,
``batch_size = min(len(dataset), batch_size)``, random horizontal flip.
Batches are NHWC float32 numpy arrays ready for ``device_put`` with a
batch sharding; flip augmentation is vectorized on the batch.
"""

from __future__ import annotations

import numpy as np


def get_dataset(config):
    """Config-driven dataset construction (reference util.py:80-113)."""
    from psld_tpu.registry import get_module

    name = str(config.data.name).lower()
    if name == "cifar10":
        assert int(config.data.image_size) == 32
    cls = get_module("datasets", name)
    return cls(
        config.data.root,
        norm=bool(config.data.norm),
        image_size=int(config.data.image_size),
        return_target=bool(config.data.get("return_target", False)),
    )


class EpochLoader:
    """Numpy epoch iterator: per-epoch reshuffle, drop-last batching,
    optional random hflip.

    Multi-host: pass ``process_index``/``process_count`` and seed all hosts
    identically — the global permutation is then host-identical and each
    host loads only its contiguous slice of every global batch (the slice
    ``shard_batch`` assembles into the global array). ``batch_size`` is
    always the GLOBAL batch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, hflip: bool = False, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = min(len(dataset), int(batch_size))
        # keep the global batch divisible across processes
        self.batch_size -= self.batch_size % process_count
        assert self.batch_size > 0, (
            f"dataset of {len(dataset)} cannot fill {process_count} processes"
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.hflip = hflip
        self.rng = np.random.default_rng(seed)
        self.local_size = self.batch_size // process_count
        self.local_offset = process_index * self.local_size

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _augment(self, imgs: np.ndarray) -> np.ndarray:
        if not self.hflip:
            return imgs
        flip = self.rng.random(imgs.shape[0]) < 0.5
        out = imgs.copy()
        out[flip] = out[flip, :, ::-1]
        return out

    def __iter__(self):
        n = len(self.dataset)
        idxs = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            lo = start + self.local_offset
            take = idxs[lo: min(lo + self.local_size, start + self.batch_size)]
            batch = self.dataset.batch(take)
            if isinstance(batch, tuple):
                imgs, targets = batch
                yield self._augment(imgs).astype(np.float32), targets
            else:
                yield self._augment(batch).astype(np.float32)
