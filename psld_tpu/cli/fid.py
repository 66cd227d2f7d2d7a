"""FID entry point: replaces the reference's external torch-fidelity CLI
(scripts_psld/fid.sh:1 `fidelity --gpu 0 --fid --input1 A --input2 B`).

Usage:
    python -m psld_tpu.cli.fid --input1 DIR_OR_NPZ --input2 DIR_OR_NPZ \
        --weights pt_inception-2015-12-05-6726825d.pth [--batch 64] \
        [--save-stats1 out.npz]

Inputs may be PNG/JPG directories or precomputed .npz stats. Without
--weights, a random-weight network runs (pipeline smoke only; metric values
are meaningless -- the weights file cannot be downloaded on egress-restricted
TPU hosts, supply it).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def iter_image_batches(path: str, batch: int):
    from psld_tpu.utils.images import load_images_rgb

    files = sorted(
        f for ext in ("*.png", "*.jpg", "*.jpeg")
        for f in glob.glob(os.path.join(path, "**", ext), recursive=True)
    )
    if not files:
        raise ValueError(f"No images under {path}")
    for start in range(0, len(files), batch):
        chunk = files[start: start + batch]
        yield load_images_rgb(chunk).astype(np.float32) / 255.0


def compute_moments(path: str, feature_fn, batch: int):
    from psld_tpu.eval.fid import FID_DIM, FeatureMoments

    moments = FeatureMoments.zeros(FID_DIM)
    last = None
    for imgs in iter_image_batches(path, batch):
        if imgs.shape[0] != batch and last != imgs.shape[0]:
            last = imgs.shape[0]  # new shape -> one extra compile
        feats = np.asarray(feature_fn(imgs))
        moments = moments.update(feats)
    return moments


def input_stats(path: str, feature_fn, batch: int, save_to: str | None):
    from psld_tpu.eval.fid import load_stats, save_stats

    if path.endswith(".npz"):
        return load_stats(path)
    moments = compute_moments(path, feature_fn, batch)
    if save_to:
        save_stats(save_to, moments)
    return moments.finalize()


from psld_tpu.cli._common import console as _console


def main(argv=None):
    import psld_tpu

    psld_tpu.setup_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--input1", required=True)
    parser.add_argument("--input2", required=True)
    parser.add_argument("--weights", default=os.environ.get("FID_WEIGHTS"))
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--save-stats1")
    parser.add_argument("--save-stats2")
    args = parser.parse_args(argv)

    from psld_tpu.eval.fid import (
        frechet_distance,
        load_torch_checkpoint,
        make_feature_fn,
        random_params,
    )

    if args.weights:
        params = load_torch_checkpoint(args.weights)
    else:
        import jax

        print("WARNING: no --weights; using random Inception weights "
              "(values are NOT comparable FID scores)")
        params = random_params(jax.random.PRNGKey(0))
    feature_fn = make_feature_fn(params)

    mu1, s1 = input_stats(args.input1, feature_fn, args.batch,
                          args.save_stats1)
    mu2, s2 = input_stats(args.input2, feature_fn, args.batch,
                          args.save_stats2)
    fid = frechet_distance(mu1, s1, mu2, s2)
    print(f"frechet_inception_distance: {fid:.6f}")
    return fid


cli = _console(main)


if __name__ == "__main__":
    main()
