"""Datasets (reference main/datasets/), numpy-native NHWC.

No torch/torchvision dependency and no downloads (TPU hosts are often
egress-restricted): CIFAR-10 and MNIST are parsed directly from their
standard on-disk formats; image-folder datasets load lazily via PIL. A
``synthetic`` dataset provides procedural data for smoke tests.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.utils.images import data_scaler


class ArrayDataset:
    """In-memory uint8 NHWC images + optional integer targets."""

    def __init__(self, images: np.ndarray, targets=None, norm: bool = True,
                 return_target: bool = False, subsample_size=None):
        if subsample_size is not None:
            images = images[: int(subsample_size)]
            targets = None if targets is None else targets[: int(subsample_size)]
        self.images = images
        self.targets = targets
        self.norm = norm
        self.return_target = return_target

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = data_scaler(self.images[idx], norm=self.norm)
        if self.return_target:
            return img, int(self.targets[idx])
        return img

    def batch(self, idxs: np.ndarray):
        """Vectorized batch fetch (hot path for the input pipeline)."""
        imgs = data_scaler(self.images[idxs], norm=self.norm)
        if self.return_target:
            return imgs, self.targets[idxs].astype(np.int32)
        return imgs


@register_module(category="datasets", name="cifar10")
class CIFAR10Dataset(ArrayDataset):
    """CIFAR-10 train split parsed from `cifar-10-batches-py` pickles
    (reference datasets/cifar10.py:9-49 wraps torchvision; same data)."""

    def __init__(self, root, norm=True, return_target=False,
                 subsample_size=None, image_size=32, hflip=False, **kwargs):
        del hflip  # augmentation happens in the input pipeline
        assert image_size == 32, "CIFAR-10 is 32x32 (reference util.py:92-93)"
        base = os.path.join(root, "cifar-10-batches-py")
        if not os.path.isdir(base):
            raise ValueError(
                f"CIFAR-10 not found under {root} (need cifar-10-batches-py/)"
            )
        imgs, targets = [], []
        for i in range(1, 6):
            with open(os.path.join(base, f"data_batch_{i}"), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            imgs.append(np.asarray(d[b"data"], np.uint8))
            targets.extend(d[b"labels"])
        images = (
            np.concatenate(imgs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )
        super().__init__(images, np.asarray(targets, np.int64), norm=norm,
                         return_target=return_target,
                         subsample_size=subsample_size)


@register_module(category="datasets", name="synthetic")
class SyntheticDataset(ArrayDataset):
    """Procedural dataset for smoke tests / CI: colored Gaussian blobs on
    gradient backgrounds, 10 pseudo-classes. Not in the reference -- exists
    so the full pipeline runs on egress-restricted hosts."""

    def __init__(self, root=None, norm=True, return_target=False,
                 subsample_size=None, image_size=32, n=512, seed=0, **kwargs):
        rng = np.random.default_rng(seed)
        n = int(subsample_size or n)
        s = int(image_size)
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        images = np.empty((n, s, s, 3), np.uint8)
        targets = rng.integers(0, 10, n)
        for i in range(n):
            cx, cy = rng.uniform(0.25, 0.75, 2)
            sig = rng.uniform(0.08, 0.25)
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2))
            color = rng.uniform(0.3, 1.0, 3)
            bg = rng.uniform(0, 0.4) + rng.uniform(-0.2, 0.2) * yy
            img = bg[..., None] + blob[..., None] * color
            images[i] = (img.clip(0, 1) * 255).astype(np.uint8)
        super().__init__(images, targets, norm=norm,
                         return_target=return_target)


class _ImageFolder:
    """Lazy PIL-backed folder dataset with resize (base for CelebA/AFHQ)."""

    def __init__(self, paths, targets=None, image_size=64, norm=True,
                 return_target=False, subsample_size=None):
        if subsample_size is not None:
            paths = paths[: int(subsample_size)]
            targets = None if targets is None else targets[: int(subsample_size)]
        self.paths = paths
        self.targets = targets
        self.image_size = int(image_size)
        self.norm = norm
        self.return_target = return_target

    def __len__(self):
        return len(self.paths)

    def _load(self, path):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        if img.size != (self.image_size, self.image_size):
            img = img.resize((self.image_size, self.image_size),
                             Image.BILINEAR)
        return data_scaler(np.asarray(img, np.uint8), norm=self.norm)

    def __getitem__(self, idx):
        img = self._load(self.paths[idx])
        if self.return_target:
            return img, int(self.targets[idx])
        return img

    def _batch_native(self, paths):
        """Decode a uniform already-at-size RGB PNG batch through the
        multithreaded C++ decoder (native/pngio.cpp) — the preprocessed
        CelebA/AFHQ layouts. Returns None when the directory needs the
        PIL path (non-PNG, resize, gray/RGBA/16-bit). The first outcome
        latches BOTH ways: failure pins the PIL fallback, success skips
        the suffix scan + header probe on later batches (the decoder
        still validates every image's shape per decode — a surprise
        mismatch raises, falls back, and re-latches failure)."""
        ok = getattr(self, "_native_ok", None)
        if ok is False:
            return None
        try:
            from psld_tpu import native

            if ok is None:
                if not all(p.lower().endswith(".png") for p in paths):
                    self._native_ok = False
                    return None
                shape = native.read_png_info(paths[0])
                if shape != (self.image_size, self.image_size, 3):
                    self._native_ok = False
                    return None
            raw = native.read_png_batch(list(paths), self.image_size,
                                        self.image_size, 3)
            self._native_ok = True
            return data_scaler(raw, norm=self.norm)
        except Exception:
            self._native_ok = False
            return None

    def batch(self, idxs):
        paths = [self.paths[i] for i in idxs]
        imgs = self._batch_native(paths)
        if imgs is None:
            imgs = np.stack([self._load(p) for p in paths])
        if self.return_target:
            return imgs, self.targets[idxs].astype(np.int32)
        return imgs


@register_module(category="datasets", name="celeba64")
class CelebADataset(_ImageFolder):
    """Flat-directory CelebA loader (reference datasets/celeba.py:10-47)."""

    def __init__(self, root, norm=True, image_size=64, return_target=False,
                 subsample_size=None, **kwargs):
        if not os.path.isdir(root):
            raise ValueError(f"The specified root: {root} does not exist")
        paths = sorted(
            os.path.join(root, p) for p in os.listdir(root)
            if p.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        )
        super().__init__(paths, None, image_size=image_size, norm=norm,
                         return_target=False, subsample_size=subsample_size)


@register_module(category="datasets", name="celebahq")
class CelebAHQDataset(_ImageFolder):
    """train/val x male/female subdir layout
    (reference datasets/celebahq.py:10-47)."""

    def __init__(self, root, norm=True, image_size=256, return_target=False,
                 subsample_size=None, split="train", **kwargs):
        paths = []
        for sub in ("male", "female"):
            d = os.path.join(root, split, sub)
            if os.path.isdir(d):
                paths.extend(os.path.join(d, p) for p in sorted(os.listdir(d)))
        if not paths:
            raise ValueError(f"No CelebA-HQ images under {root}/{split}")
        super().__init__(paths, None, image_size=image_size, norm=norm,
                         subsample_size=subsample_size)


@register_module(category="datasets", name="afhqv2")
class AFHQv2Dataset(_ImageFolder):
    """dog/cat/wild subdirs with labels (reference datasets/afhq.py:10-63)."""

    CLASSES = ("cat", "dog", "wild")

    def __init__(self, root, norm=True, image_size=128, return_target=False,
                 subsample_size=None, split="train", **kwargs):
        base = os.path.join(root, split) if os.path.isdir(
            os.path.join(root, split)) else root
        paths, targets = [], []
        for label, cls in enumerate(self.CLASSES):
            d = os.path.join(base, cls)
            if os.path.isdir(d):
                for p in sorted(os.listdir(d)):
                    paths.append(os.path.join(d, p))
                    targets.append(label)
        if not paths:
            raise ValueError(f"No AFHQv2 images under {base}")
        super().__init__(paths, np.asarray(targets, np.int64),
                         image_size=image_size, norm=norm,
                         return_target=return_target,
                         subsample_size=subsample_size)


def load_mnist_images(root: str) -> np.ndarray:
    """Parse MNIST train images from the standard idx file
    (`train-images-idx3-ubyte`, optionally under MNIST/raw/)."""
    candidates = [
        os.path.join(root, "MNIST", "raw", "train-images-idx3-ubyte"),
        os.path.join(root, "train-images-idx3-ubyte"),
    ]
    for path in candidates:
        if os.path.exists(path):
            with open(path, "rb") as f:
                data = f.read()
            n = int.from_bytes(data[4:8], "big")
            return np.frombuffer(data, np.uint8, offset=16).reshape(n, 28, 28)
    raise FileNotFoundError(f"MNIST idx files not found under {root}")


@register_module(category="datasets", name="inpaint")
class InpaintDataset:
    """Pairs base-dataset images with binary masks cut from MNIST digits
    (reference datasets/inpaint.py:10-44): mask = 1 - (digit > 0), resized
    nearest to the image size, broadcast over channels.

    If MNIST is absent, ``mask_mode='square'`` produces deterministic square
    masks so the pipeline still runs.
    """

    def __init__(self, config, dataset, mask_mode: str = "mnist"):
        self.config = config
        self.dataset = dataset
        self.size = int(config.data.image_size)
        self.mask_mode = mask_mode
        self._digits = None
        if mask_mode == "mnist":
            try:
                self._digits = load_mnist_images(config.data.root)
            except (FileNotFoundError, ValueError):
                self.mask_mode = "square"

    def _mask(self, idx):
        if self.mask_mode == "mnist":
            digit = self._digits[idx % len(self._digits)]
            # nearest resize to image size
            ys = (np.arange(self.size) * 28 // self.size).clip(0, 27)
            digit = digit[np.ix_(ys, ys)]
            mask = 1 - (digit > 0).astype(np.float32)
        else:
            mask = np.ones((self.size, self.size), np.float32)
            q = self.size // 4
            mask[q: 3 * q, q: 3 * q] = 0.0
        return np.repeat(mask[..., None], 3, axis=-1)

    def __len__(self):
        n = int(self.config.evaluation.n_samples)
        return min(n, len(self.dataset))

    def __getitem__(self, idx):
        img = self.dataset[idx]
        mask = self._mask(idx)
        assert mask.shape == img.shape, (mask.shape, img.shape)
        return img, mask

    def batch(self, idxs):
        imgs = self.dataset.batch(idxs)
        masks = np.stack([self._mask(int(i)) for i in idxs])
        return imgs, masks


@register_module(category="datasets", name="latent")
class SDELatentDataset:
    """Prior-sample source for generation (reference datasets/latent.py:5-28).

    The reference pre-materializes all n_samples prior draws on the host; here
    samples are drawn on device per batch from a fold_in of (seed, index), so
    50k-sample runs need no host memory and shard trivially across devices.
    """

    def __init__(self, sde, config):
        self.sde = sde
        self.num_samples = int(config.evaluation.n_samples)
        self.shape = (
            int(config.data.num_channels),
            int(config.data.image_size),
        )

    def __len__(self):
        return self.num_samples

    def sample_batch(self, key, batch_size: int):
        c, s = self.shape
        return self.sde.prior_sampling(key, (batch_size, s, s, c))
