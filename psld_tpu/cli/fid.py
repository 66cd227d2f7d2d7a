"""Fidelity-metrics entry point: replaces the reference's external
torch-fidelity CLI (scripts_psld/fid.sh:1 `fidelity --gpu 0 --fid --input1 A
--input2 B`) — including the tool's other two metrics (--kid, --isc) that the
reference gets for free from `fidelity`.

Usage:
    python -m psld_tpu.cli.fid --input1 DIR_OR_NPZ --input2 DIR_OR_NPZ \
        --weights pt_inception-2015-12-05-6726825d.pth [--batch 64] \
        [--fid] [--kid] [--isc] [--save-stats1 out.npz]

With no metric flag, --fid is implied (reference parity). Inputs may be
PNG/JPG directories or precomputed .npz stats (.npz carries only FID moments,
so KID/ISC need image directories). ISC is a single-set metric and is
reported for --input1 (the generated set), as `fidelity` does. Without
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


def collect(path: str, feature_fn, batch: int, want_feats: bool,
            want_logits: bool):
    """One pass over an image dir -> (FID moments, feats|None, logits|None).

    feature_fn returns feats or (feats, logits) depending on how it was
    built; FID moments always stream (constant memory), raw features are
    kept only when KID/ISC asked for them (~400 MB f32 at 50k x 2048).
    """
    from psld_tpu.eval.fid import FID_DIM, FeatureMoments

    moments = FeatureMoments.zeros(FID_DIM)
    feats_out, logits_out = [], []
    for imgs in iter_image_batches(path, batch):
        out = feature_fn(imgs)
        feats, logits = out if isinstance(out, tuple) else (out, None)
        feats = np.asarray(feats)
        moments = moments.update(feats)
        if want_feats:
            feats_out.append(feats)
        if want_logits:
            logits_out.append(np.asarray(logits))
    return (moments,
            np.concatenate(feats_out) if feats_out else None,
            np.concatenate(logits_out) if logits_out else None)


def compute_moments(path: str, feature_fn, batch: int):
    """Streaming FID moments over an image dir (used by the FID-vs-NFE
    sweep too, eval/sweep.py)."""
    return collect(path, feature_fn, batch, False, False)[0]


def input_stats(path: str, feature_fn, batch: int, save_to: str | None):
    from psld_tpu.eval.fid import load_stats, save_stats

    if path.endswith(".npz"):
        return load_stats(path)
    moments, _, _ = collect(path, feature_fn, batch, False, False)
    if save_to:
        save_stats(save_to, moments)
    return moments.finalize()


from psld_tpu.cli._common import console as _console


def main(argv=None):
    import psld_tpu

    psld_tpu.setup_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--input1", required=True)
    parser.add_argument("--input2")
    parser.add_argument("--weights", default=os.environ.get("FID_WEIGHTS"))
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--fid", action="store_true")
    parser.add_argument("--kid", action="store_true")
    parser.add_argument("--isc", action="store_true")
    parser.add_argument("--kid-subsets", type=int, default=100)
    parser.add_argument("--kid-subset-size", type=int, default=1000)
    parser.add_argument("--isc-splits", type=int, default=10)
    parser.add_argument("--save-stats1")
    parser.add_argument("--save-stats2")
    args = parser.parse_args(argv)
    if not (args.fid or args.kid or args.isc):
        args.fid = True  # reference parity: fid.sh computes FID only
    if (args.fid or args.kid) and not args.input2:
        parser.error("--fid/--kid need --input2")
    if (args.kid or args.isc) and (args.input1.endswith(".npz") or
                                   (args.input2 or "").endswith(".npz")):
        parser.error(".npz stats carry only FID moments; KID/ISC need "
                     "image directories")

    from psld_tpu.eval.fid import (
        frechet_distance,
        isc_from_logits,
        kid_from_features,
        load_torch_checkpoint,
        make_feature_fn,
        make_feature_logits_fn,
        random_params,
        save_stats,
    )

    if args.weights:
        params = load_torch_checkpoint(args.weights)
    else:
        import jax

        print("WARNING: no --weights; using random Inception weights "
              "(values are NOT comparable scores)")
        params = random_params(jax.random.PRNGKey(0), with_fc=args.isc)

    results = {}
    if args.kid or args.isc:
        feature_fn = (make_feature_logits_fn(params) if args.isc
                      else make_feature_fn(params))
        m1, f1, l1 = collect(args.input1, feature_fn, args.batch,
                             want_feats=args.kid, want_logits=args.isc)
        if args.save_stats1:
            save_stats(args.save_stats1, m1)
        if args.input2:
            m2, f2, _ = collect(args.input2, feature_fn, args.batch,
                                want_feats=args.kid, want_logits=False)
            if args.save_stats2:
                save_stats(args.save_stats2, m2)
        if args.fid:
            results["frechet_inception_distance"] = frechet_distance(
                *m1.finalize(), *m2.finalize())
        if args.kid:
            kid_mean, kid_std = kid_from_features(
                f1, f2, subsets=args.kid_subsets,
                subset_size=args.kid_subset_size)
            results["kernel_inception_distance_mean"] = kid_mean
            results["kernel_inception_distance_std"] = kid_std
        if args.isc:
            isc_mean, isc_std = isc_from_logits(l1, splits=args.isc_splits)
            results["inception_score_mean"] = isc_mean
            results["inception_score_std"] = isc_std
    else:
        feature_fn = make_feature_fn(params)
        mu1, s1 = input_stats(args.input1, feature_fn, args.batch,
                              args.save_stats1)
        mu2, s2 = input_stats(args.input2, feature_fn, args.batch,
                              args.save_stats2)
        results["frechet_inception_distance"] = frechet_distance(
            mu1, s1, mu2, s2)

    for name, value in results.items():
        print(f"{name}: {value:.6f}")
    return (results["frechet_inception_distance"] if args.fid
            else next(iter(results.values())))


cli = _console(main)


if __name__ == "__main__":
    main()
