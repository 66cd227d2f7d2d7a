"""Prediction-writer tests: directory layout, rank/batch filename parity
(reference callbacks.py:88-213 — per-rank names avoid write races), momentum
chunking, denorm, and .npy mode."""

import glob
import os

import numpy as np
from PIL import Image

from psld_tpu.eval.writers import InpaintingImageWriter, SimpleImageWriter


def _batch(n=3, size=8, ch=6, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, size, size, ch)).astype(np.float32)


def test_simple_writer_names_and_momentum_chunk(tmp_path):
    w = SimpleImageWriter(str(tmp_path), sample_prefix="tpu",
                          is_augmented=True)
    w.write_batch(_batch(), rank=2, batch_idx=5)
    files = sorted(glob.glob(f"{tmp_path}/images/*.png"))
    assert [os.path.basename(f) for f in files] == [
        f"output_tpu_2_5_{i}.png" for i in range(3)
    ]
    img = np.asarray(Image.open(files[0]))
    assert img.shape == (8, 8, 3)  # momentum half chunked off


def test_simple_writer_denorm_range(tmp_path):
    w = SimpleImageWriter(str(tmp_path), sample_prefix="p",
                          is_augmented=False, is_norm=True)
    x = np.full((1, 4, 4, 3), -1.0, np.float32)
    w.write_batch(x, rank=0, batch_idx=0)
    img = np.asarray(Image.open(glob.glob(f"{tmp_path}/images/*.png")[0]))
    assert img.max() == 0  # -1 in model space -> 0 after x*0.5+0.5


def test_simple_writer_np_mode(tmp_path):
    w = SimpleImageWriter(str(tmp_path), sample_prefix="p", save_mode="np",
                          is_augmented=False)
    w.write_batch(_batch(ch=3), rank=0, batch_idx=1)
    npys = glob.glob(f"{tmp_path}/images/*.npy")
    assert len(npys) == 3
    arr = np.load(npys[0])
    assert arr.shape == (8, 8, 3)


def test_simple_writer_path_prefix(tmp_path):
    w = SimpleImageWriter(str(tmp_path), sample_prefix="p",
                          path_prefix="1000", is_augmented=False)
    w.write_batch(_batch(ch=3), rank=0, batch_idx=0)
    assert glob.glob(f"{tmp_path}/1000/images/*.png")


def test_inpainting_writer_extra_dirs(tmp_path):
    w = InpaintingImageWriter(str(tmp_path), sample_prefix="p",
                              save_batch=True, is_augmented=True)
    img = _batch(ch=3, seed=1)
    mask = np.ones_like(img)
    mask[:, 2:6, 2:6, :] = 0.0
    w.write_batch(_batch(), rank=0, batch_idx=0, batch=(img, mask))
    assert len(glob.glob(f"{tmp_path}/images/*.png")) == 3
    assert len(glob.glob(f"{tmp_path}/batch/*.png")) == 3
    assert len(glob.glob(f"{tmp_path}/corrupt/*.png")) == 3
