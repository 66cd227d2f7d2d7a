"""Data-layer format tests: each loader parses its on-disk layout from
synthetic fixtures written in the real format (reference main/datasets/)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

import psld_tpu

psld_tpu.import_modules_into_registry()

from psld_tpu.config import ConfigDict  # noqa: E402
from psld_tpu.data import datasets as D  # noqa: E402
from psld_tpu.registry import get_module  # noqa: E402


def _write_cifar(root, n_per_batch=4):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        d = {
            b"data": rng.integers(0, 256, (n_per_batch, 3072), np.uint8),
            b"labels": list(rng.integers(0, 10, n_per_batch)),
        }
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)


def test_cifar10_parser(tmp_path):
    _write_cifar(str(tmp_path))
    ds = get_module("datasets", "cifar10")(root=str(tmp_path), norm=True,
                                           return_target=True)
    assert len(ds) == 20
    img, y = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert 0 <= y < 10
    # CHW pickle layout -> HWC: red plane of the pickle is channel 0
    with open(tmp_path / "cifar-10-batches-py" / "data_batch_1", "rb") as f:
        raw = pickle.load(f, encoding="bytes")[b"data"][0]
    red = raw[:1024].reshape(32, 32).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(img[..., 0], red, atol=1e-2)


def test_cifar10_missing_root_raises(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        get_module("datasets", "cifar10")(root=str(tmp_path / "nope"))


def _write_pngs(d, n, size, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), np.uint8), "RGB"
        ).save(os.path.join(d, f"{i:03d}.png"))


def test_celeba_flat_dir_and_resize(tmp_path):
    _write_pngs(str(tmp_path), 5, 128)  # stored larger -> bilinear resize
    ds = get_module("datasets", "celeba64")(root=str(tmp_path),
                                            image_size=64)
    assert len(ds) == 5
    img = ds[0]
    assert img.shape == (64, 64, 3)
    batch = ds.batch(np.asarray([0, 2, 4]))
    assert batch.shape == (3, 64, 64, 3)


def test_afhq_subdirs_and_labels(tmp_path):
    for cls in ("cat", "dog", "wild"):
        _write_pngs(str(tmp_path / "train" / cls), 2, 32)
    ds = get_module("datasets", "afhqv2")(root=str(tmp_path), image_size=32,
                                          return_target=True)
    assert len(ds) == 6
    labels = sorted(int(ds[i][1]) for i in range(6))
    assert labels == [0, 0, 1, 1, 2, 2]  # cat, dog, wild


def test_celebahq_split_layout(tmp_path):
    for sub in ("male", "female"):
        _write_pngs(str(tmp_path / "train" / sub), 2, 16)
    ds = get_module("datasets", "celebahq")(root=str(tmp_path),
                                            image_size=16)
    assert len(ds) == 4 and ds[0].shape == (16, 16, 3)


def _write_mnist_idx(root, n=3):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (n, 28, 28), np.uint8)
    # pixel 0 forced to 0 so the mask has known region
    imgs[:, :5, :5] = 0
    header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + (28).to_bytes(4, "big") + (28).to_bytes(4, "big")
    with open(os.path.join(root, "train-images-idx3-ubyte"), "wb") as f:
        f.write(header + imgs.tobytes())
    return imgs


def test_inpaint_mnist_masks(tmp_path):
    imgs = _write_mnist_idx(str(tmp_path))
    base = get_module("datasets", "synthetic")(image_size=28, n=8)
    cfg = ConfigDict({"data": {"image_size": 28, "root": str(tmp_path)},
                      "evaluation": {"n_samples": 4}})
    ds = D.InpaintDataset(cfg, base)
    assert ds.mask_mode == "mnist"
    img, mask = ds[0]
    assert mask.shape == img.shape
    # mask = 1 - (digit > 0): the zeroed digit corner must stay known (1)
    assert (mask[:5, :5] == 1.0).all()
    np.testing.assert_array_equal(
        mask[..., 0], 1.0 - (imgs[0] > 0).astype(np.float32))


def test_inpaint_square_fallback(tmp_path):
    base = get_module("datasets", "synthetic")(image_size=16, n=8)
    cfg = ConfigDict({"data": {"image_size": 16, "root": str(tmp_path)},
                      "evaluation": {"n_samples": 4}})
    ds = D.InpaintDataset(cfg, base)
    assert ds.mask_mode == "square"
    _, mask = ds[0]
    assert mask[8, 8, 0] == 0.0 and mask[0, 0, 0] == 1.0
    assert len(ds) == 4


def test_folder_batch_native_fast_path_matches_pil(tmp_path):
    """Uniform at-size RGB PNG dirs decode through the C++ batch decoder;
    the result must be bitwise the PIL path's (same scaler, no resize)."""
    import numpy as np

    _write_pngs(str(tmp_path), 6, 64)
    ds = get_module("datasets", "celeba64")(root=str(tmp_path),
                                            image_size=64)
    idxs = np.asarray([0, 3, 5])
    fast = ds.batch(idxs)
    assert getattr(ds, "_native_ok", None) is True
    ds2 = get_module("datasets", "celeba64")(root=str(tmp_path),
                                             image_size=64)
    ds2._native_ok = False  # force the PIL path
    slow = ds2.batch(idxs)
    np.testing.assert_array_equal(fast, slow)


def test_folder_batch_native_falls_back_on_resize(tmp_path):
    """Stored-larger dirs need the bilinear resize -> PIL path, latched."""
    import numpy as np

    _write_pngs(str(tmp_path), 3, 128)
    ds = get_module("datasets", "celeba64")(root=str(tmp_path),
                                            image_size=64)
    out = ds.batch(np.asarray([0, 1]))
    assert out.shape == (2, 64, 64, 3)
    assert ds._native_ok is False
