"""Dataset acquisition/staging — the reproduction kit's data half.

The reference auto-downloads CIFAR-10 / MNIST through torchvision
(reference main/datasets/cifar10.py:29, main/datasets/inpaint.py:30,
``download=True``). This repo's parsers read the SAME on-disk formats
(``cifar-10-batches-py`` pickles, MNIST idx files — psld_tpu/data/
datasets.py), but containers without egress cannot fetch them; this script
closes that gap on a host that *does* have network access:

    python scripts/prepare_data.py --root /data cifar10 mnist
    python scripts/prepare_data.py --root /data --verify-only

CelebA-64 / CelebA-HQ / AFHQv2 have no canonical single-file download
(licensing/gdrive); ``--help`` documents the expected directory layouts,
and ``--verify-only`` checks whatever is staged by constructing the repo's
own dataset classes on it (the identical code path training uses).
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import os
import shutil
import sys
import tarfile
import urllib.request

CIFAR10_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
CIFAR10_MD5 = "c58f30108f718f92721af3b95e74349a"
# torchvision's primary MNIST mirror (yann.lecun.com requires auth now)
MNIST_BASE = "https://ossci-datasets.s3.amazonaws.com/mnist/"
MNIST_FILES = {
    "train-images-idx3-ubyte.gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
    "train-labels-idx1-ubyte.gz": "d53e105ee54ea40749a09fcbcd1e9432",
}

FOLDER_LAYOUTS = """\
Directory layouts for the folder datasets (match the reference's
preprocessed trees; see psld_tpu/data/datasets.py):

  celeba64:   <root>/celeba64/*.png          (64x64 RGB, flat dir)
  celebahq:   <root>/celebahq/{train,val}/{male,female}/*.png
  afhqv2:     <root>/afhq/train/{dog,cat,wild}/*.png

These require accepting the datasets' licenses; download them from their
official sources and preprocess to the sizes above (any resize happens
at load time if the folder images are larger).
"""


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(url: str, dest: str, md5: str | None = None) -> str:
    if os.path.exists(dest) and (md5 is None or _md5(dest) == md5):
        print(f"  cached: {dest}")
        return dest
    print(f"  fetching {url}")
    tmp = dest + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    if md5 is not None and _md5(tmp) != md5:
        os.unlink(tmp)
        raise RuntimeError(f"md5 mismatch for {url}")
    os.replace(tmp, dest)
    return dest


def stage_cifar10(root: str, tar_path: str | None = None) -> str:
    """Extract cifar-10-python.tar.gz into <root>/cifar-10-batches-py —
    the tree CIFAR10Dataset parses. ``tar_path`` skips the download (used
    by the fixture test)."""
    os.makedirs(root, exist_ok=True)
    out = os.path.join(root, "cifar-10-batches-py")
    if tar_path is None:
        tar_path = _download(CIFAR10_URL,
                             os.path.join(root, "cifar-10-python.tar.gz"),
                             CIFAR10_MD5)
    with tarfile.open(tar_path, "r:gz") as tf:
        for m in tf.getmembers():
            # flatten to <root>/cifar-10-batches-py/<basename>
            base = os.path.basename(m.name)
            if not m.isfile() or not base:
                continue
            src = tf.extractfile(m)
            assert src is not None
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, base), "wb") as dst:
                shutil.copyfileobj(src, dst)
    return out


def stage_mnist(root: str, gz_paths: dict[str, str] | None = None) -> str:
    """Gunzip the MNIST idx files into <root>/MNIST/raw — the layout
    load_mnist_images probes first."""
    out = os.path.join(root, "MNIST", "raw")
    os.makedirs(out, exist_ok=True)
    for name, md5 in MNIST_FILES.items():
        if gz_paths is not None:
            gz = gz_paths[name]
        else:
            gz = _download(MNIST_BASE + name, os.path.join(out, name), md5)
        raw = os.path.join(out, name[:-3])
        with gzip.open(gz, "rb") as src, open(raw, "wb") as dst:
            shutil.copyfileobj(src, dst)
    return out


def verify(root: str) -> dict[str, str]:
    """Construct the repo's own parsers on the staged tree (the identical
    code path training uses) and report what loads."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.data.datasets import load_mnist_images
    from psld_tpu.registry import get_module

    report: dict[str, str] = {}
    try:
        ds = get_module("datasets", "cifar10")(root=root)
        report["cifar10"] = f"ok: {len(ds)} images"
    except Exception as e:  # noqa: BLE001 — a report, not control flow
        report["cifar10"] = f"missing ({e})"
    try:
        imgs = load_mnist_images(root)
        report["mnist"] = f"ok: {imgs.shape[0]} mask digits"
    except Exception as e:  # noqa: BLE001
        report["mnist"] = f"missing ({e})"
    for name in ("celeba64", "celebahq", "afhqv2"):
        try:
            ds = get_module("datasets", name)(root=root)
            report[name] = f"ok: {len(ds)} images"
        except Exception as e:  # noqa: BLE001
            report[name] = f"missing ({e})"
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, epilog=FOLDER_LAYOUTS,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("datasets", nargs="*", choices=["cifar10", "mnist"],
                    help="datasets to download+stage")
    ap.add_argument("--root", required=True,
                    help="data root (the config's data.root)")
    ap.add_argument("--verify-only", action="store_true",
                    help="no downloads; parse whatever is staged")
    args = ap.parse_args(argv)

    if not args.verify_only:
        if not args.datasets:
            ap.error("pick datasets to stage, or pass --verify-only")
        for name in args.datasets:
            print(f"staging {name} under {args.root}")
            (stage_cifar10 if name == "cifar10" else stage_mnist)(args.root)

    print(f"verifying {args.root} with the repo's parsers:")
    failures = 0
    for name, status in verify(args.root).items():
        print(f"  {name:10s} {status}")
        failures += (not status.startswith("ok")
                     and name in (args.datasets or ()))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
