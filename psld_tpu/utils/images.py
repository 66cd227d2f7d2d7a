"""Image IO helpers (reference main/util.py:124-169), NHWC numpy."""

from __future__ import annotations

import os

import numpy as np


def data_scaler(img, norm: bool = True) -> np.ndarray:
    """uint8 image -> [-1, 1] (norm) or [0, 1] (reference util.py:25-30)."""
    img = np.asarray(img).astype(np.float32)
    if norm:
        return img / 127.5 - 1.0
    return img / 255.0


def to_uint8(batch: np.ndarray, denorm: bool = True) -> np.ndarray:
    """float NHWC -> uint8, optionally denormalizing x*0.5+0.5
    (reference util.py:147-158)."""
    x = np.asarray(batch, np.float32)
    if denorm:
        x = x * 0.5 + 0.5
    return (x * 255.0).clip(0, 255).astype(np.uint8)


def save_as_images(batch, file_name: str = "output", denorm: bool = True):
    """Save an NHWC float batch as indexed PNGs (reference util.py:147-158).

    Uses the native C++ writer when available, PIL otherwise.
    """
    arr = to_uint8(batch, denorm=denorm)
    try:
        from psld_tpu.native import write_png_batch

        write_png_batch(arr, file_name)
        return
    except Exception:
        pass
    from PIL import Image

    for i, img in enumerate(arr):
        if img.shape[-1] == 1:
            img = img[..., 0]
        Image.fromarray(img).save(f"{file_name}_{i}.png", "png")


def save_as_np(batch, file_name: str = "output", denorm: bool = True):
    """Save an NHWC float batch as indexed .npy (reference util.py:161-169;
    the reference min-max normalizes here -- kept)."""
    x = np.asarray(batch, np.float32)
    if denorm:
        b = x.shape[0]
        flat = x.reshape(b, -1)
        lo = flat.min(axis=1).reshape(b, 1, 1, 1)
        hi = flat.max(axis=1).reshape(b, 1, 1, 1)
        x = (x - lo) / np.maximum(hi - lo, 1e-8)
    for i, img in enumerate(x):
        np.save(f"{file_name}_{i}.npy", img)


def load_images_rgb(paths) -> np.ndarray:
    """Load image files as an (N, H, W, 3) uint8 batch.

    Fast path: same-shaped RGB/palette PNGs decode through the native
    multithreaded C++ decoder; anything else (mixed shapes, gray/RGBA,
    JPEG, exotic PNG variants) falls back to PIL per file.
    """
    paths = list(paths)
    if not paths:
        return np.empty((0, 0, 0, 3), np.uint8)
    if all(p.lower().endswith(".png") for p in paths):
        try:
            from psld_tpu import native

            h, w, c = native.read_png_info(paths[0])
            if c == 3:
                return native.read_png_batch(paths, h, w, 3)
        except Exception:
            pass
    from PIL import Image

    return np.stack([np.asarray(Image.open(p).convert("RGB"), np.uint8)
                     for p in paths])
