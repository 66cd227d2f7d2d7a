"""Reproduction-kit fixture tests: scripts/prepare_data.py staging drives
the IDENTICAL extraction/parse path as a real download, on tiny synthetic
archives built in-tree (reference equivalent: torchvision's download=True,
main/datasets/cifar10.py:29, main/datasets/inpaint.py:30)."""

import gzip
import io
import pickle
import struct
import sys
import tarfile
from pathlib import Path

import numpy as np

SCRIPTS = str(Path(__file__).resolve().parent.parent / "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

import prepare_data  # noqa: E402


def _fake_cifar_tar(path, n_per_batch=4, seed=0):
    """A cifar-10-python.tar.gz shaped exactly like the real one
    (data_batch_{1..5} pickles of uint8 [N, 3072] + labels)."""
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w:gz") as tf:
        for i in range(1, 6):
            d = {
                b"data": rng.integers(0, 256, (n_per_batch, 3072),
                                      dtype=np.uint8),
                b"labels": rng.integers(0, 10, n_per_batch).tolist(),
            }
            blob = pickle.dumps(d)
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{i}")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    return path


def _fake_mnist_gzs(tmpdir, n=6, seed=1):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, n, dtype=np.uint8)
    paths = {}
    img_name = "train-images-idx3-ubyte.gz"
    lbl_name = "train-labels-idx1-ubyte.gz"
    p = tmpdir / img_name
    with gzip.open(p, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28) + imgs.tobytes())
    paths[img_name] = str(p)
    p = tmpdir / lbl_name
    with gzip.open(p, "wb") as f:
        f.write(struct.pack(">II", 2049, n) + labels.tobytes())
    paths[lbl_name] = str(p)
    return paths, imgs


def test_stage_cifar10_parses_with_repo_loader(tmp_path):
    tar = _fake_cifar_tar(tmp_path / "cifar-10-python.tar.gz")
    out = prepare_data.stage_cifar10(str(tmp_path), tar_path=str(tar))
    assert out.endswith("cifar-10-batches-py")

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.registry import get_module

    ds = get_module("datasets", "cifar10")(root=str(tmp_path),
                                           return_target=True)
    assert len(ds) == 20  # 5 batches x 4
    img, target = ds[0]
    assert img.shape == (32, 32, 3) and 0 <= target < 10
    assert img.min() >= -1.0 and img.max() <= 1.0


def test_stage_mnist_parses_with_repo_loader(tmp_path):
    gzs, imgs = _fake_mnist_gzs(tmp_path)
    prepare_data.stage_mnist(str(tmp_path), gz_paths=gzs)

    from psld_tpu.data.datasets import load_mnist_images

    got = load_mnist_images(str(tmp_path))
    np.testing.assert_array_equal(got, imgs)


def test_verify_reports_and_cli_exit(tmp_path, capsys):
    tar = _fake_cifar_tar(tmp_path / "c.tar.gz")
    prepare_data.stage_cifar10(str(tmp_path), tar_path=str(tar))
    report = prepare_data.verify(str(tmp_path))
    assert report["cifar10"].startswith("ok: 20")
    assert report["mnist"].startswith("missing")

    # --verify-only CLI path exits 0 (report-only, nothing was requested)
    rc = prepare_data.main(["--root", str(tmp_path), "--verify-only"])
    assert rc == 0
    assert "cifar10" in capsys.readouterr().out
