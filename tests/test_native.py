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


# ---------------- decoder ----------------


def test_read_png_roundtrip_all_channel_counts(tmp_path):
    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (13, 19, c), np.uint8)
        path = str(tmp_path / f"rt{c}.png")
        native.write_png(path, img)
        assert native.read_png_info(path) == (13, 19, c)
        np.testing.assert_array_equal(native.read_png(path), img)


def test_read_png_decodes_pil_output(tmp_path):
    """PIL uses every row filter adaptively — exercises un-filtering."""
    rng = np.random.default_rng(6)
    # gradient + noise drives PIL to pick Sub/Up/Average/Paeth filters
    base = np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)
    img = (base + rng.normal(0, 12, base.shape)).clip(0, 255).astype(np.uint8)
    path = str(tmp_path / "pil.png")
    Image.fromarray(img).save(path, "png", optimize=True)
    np.testing.assert_array_equal(native.read_png(path), img)


def test_read_png_palette_expands_to_rgb(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    pal = Image.fromarray(img).convert("P", palette=Image.ADAPTIVE)
    path = str(tmp_path / "pal.png")
    pal.save(path, "png")
    h, w, c = native.read_png_info(path)
    assert (h, w, c) == (16, 16, 3)
    np.testing.assert_array_equal(native.read_png(path),
                                  np.asarray(pal.convert("RGB")))


def test_read_png_batch_parallel(tmp_path):
    rng = np.random.default_rng(8)
    batch = rng.integers(0, 256, (32, 16, 16, 3), np.uint8)
    prefix = str(tmp_path / "b")
    native.write_png_batch(batch, prefix)
    paths = [f"{prefix}_{i}.png" for i in range(32)]
    out = native.read_png_batch(paths, 16, 16, 3, threads=8)
    np.testing.assert_array_equal(out, batch)


def test_read_png_unsupported_falls_loud(tmp_path):
    """A 16-bit-depth PNG (hand-built header; PIL deprecated writing them)
    must raise UnsupportedPng so callers fall back to PIL."""
    import struct
    import zlib

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(
            ">I", crc)

    ihdr = struct.pack(">IIBBBBB", 8, 8, 16, 0, 0, 0, 0)  # depth 16, gray
    path = str(tmp_path / "deep.png")
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(8 * (1 + 16))))
                + chunk(b"IEND", b""))
    with pytest.raises(native.UnsupportedPng):
        native.read_png_info(path)


def test_read_png_shape_mismatch(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    path = str(tmp_path / "s.png")
    native.write_png(path, img)
    with pytest.raises(ValueError, match="shape mismatch"):
        native.read_png_batch([path], 16, 16, 3)


def test_read_png_corrupt_file(tmp_path):
    path = str(tmp_path / "junk.png")
    with open(path, "wb") as f:
        f.write(b"not a png at all")
    with pytest.raises(OSError):
        native.read_png(path)


def test_read_throughput_beats_pil(tmp_path):
    rng = np.random.default_rng(10)
    batch = rng.integers(0, 256, (256, 32, 32, 3), np.uint8)
    prefix = str(tmp_path / "r")
    native.write_png_batch(batch, prefix)
    paths = [f"{prefix}_{i}.png" for i in range(256)]

    t0 = time.time()
    out = native.read_png_batch(paths, 32, 32, 3, threads=0)
    t_native = time.time() - t0
    np.testing.assert_array_equal(out, batch)

    t0 = time.time()
    pil = np.stack([np.asarray(Image.open(p)) for p in paths])
    t_pil = time.time() - t0
    np.testing.assert_array_equal(pil, batch)

    assert t_native < t_pil, (t_native, t_pil)
