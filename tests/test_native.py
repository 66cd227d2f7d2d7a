"""Native C++ PNG encoder tests: byte-level validity (PIL round-trip),
parity with the PIL path, threading, and throughput sanity."""

import os
import time

import numpy as np
import pytest

native = pytest.importorskip("psld_tpu.native")
try:
    native._get_lib()
except Exception as e:  # pragma: no cover - toolchain missing
    pytest.skip(f"native toolchain unavailable: {e}", allow_module_level=True)

from PIL import Image


def test_single_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 3), np.uint8)
    path = str(tmp_path / "one.png")
    native.write_png(path, img)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)


def test_grayscale_and_rgba(tmp_path):
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (8, 8), np.uint8)
    native.write_png(str(tmp_path / "g.png"), gray)
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "g.png")), gray)
    rgba = rng.integers(0, 256, (8, 8, 4), np.uint8)
    native.write_png(str(tmp_path / "a.png"), rgba)
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "a.png")), rgba)


def test_batch_write_parallel(tmp_path):
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    prefix = str(tmp_path / "out")
    native.write_png_batch(batch, prefix, threads=8)
    for i in (0, 31, 63):
        back = np.asarray(Image.open(f"{prefix}_{i}.png"))
        np.testing.assert_array_equal(back, batch[i])
    assert len(os.listdir(tmp_path)) == 64


def test_save_as_images_uses_native(tmp_path):
    from psld_tpu.utils.images import save_as_images

    batch = np.random.default_rng(3).uniform(-1, 1, (4, 16, 16, 3))
    save_as_images(batch, file_name=str(tmp_path / "img"))
    files = sorted(os.listdir(tmp_path))
    assert files == [f"img_{i}.png" for i in range(4)]
    back = np.asarray(Image.open(tmp_path / "img_0.png"))
    want = ((batch[0] * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(back, want)


def test_batch_error_on_bad_path(tmp_path):
    batch = np.zeros((2, 4, 4, 3), np.uint8)
    with pytest.raises(OSError):
        native.write_png_batch(batch, "/nonexistent_dir_xyz/out")


def test_throughput_beats_pil(tmp_path):
    """The point of the native writer: meaningfully faster than PIL."""
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, (256, 32, 32, 3), np.uint8)

    t0 = time.time()
    native.write_png_batch(batch, str(tmp_path / "n"), threads=0)
    t_native = time.time() - t0

    t0 = time.time()
    for i in range(len(batch)):
        Image.fromarray(batch[i]).save(tmp_path / f"p_{i}.png", "png")
    t_pil = time.time() - t0

    assert t_native < t_pil, (t_native, t_pil)
