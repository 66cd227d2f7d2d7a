"""FID-vs-NFE sweep entry point (speed-vs-quality study).

The reference runs this study by hand, re-editing ``n_discrete_steps`` in
scripts_psld/sota/uncond/cifar10/sample_uncond_psld.sh:31-33 between runs
and invoking torch-fidelity per directory; here one command produces the
whole JSONL table.

Usage (sweep flags + any Hydra-style config overrides, mixed freely):

    python -m psld_tpu.cli.sweep_fid_nfe \
        --samplers em_sde,sscs_sde,sscs2m_sde,rk_ode --nfes 20,50,100,1000 \
        --strides uniform,quadratic --out-dir /tmp/sweep \
        [--ref-dir CIFAR_PNGS] [--ref-stats stats.npz] [--weights pt.pth] \
        +dataset=cifar10/cifar10_psld dataset.diffusion.data.root=... \
        dataset.diffusion.evaluation.chkpt_path=... \
        dataset.diffusion.evaluation.n_samples=1024
"""

from __future__ import annotations

import argparse
import sys

from psld_tpu.cli._common import console as _console


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--samplers", default="em_sde,sscs_sde,sscs2m_sde,rk_ode")
    parser.add_argument("--nfes", default="20,50,100,1000")
    parser.add_argument("--strides", default="uniform,quadratic")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--ref-dir", default=None,
                        help="directory of real images (pixel stats + FID)")
    parser.add_argument("--ref-stats", default=None,
                        help="precomputed FID stats .npz for the data side")
    parser.add_argument("--weights", default=None,
                        help="pt_inception-2015-12-05 .pth (enables FID)")
    parser.add_argument("--fid-batch", type=int, default=64)
    parser.add_argument("--swd", action="store_true",
                        help="add the weight-free multi-scale sliced "
                             "Wasserstein distance vs --ref-dir")
    parser.add_argument("--kid", action="store_true",
                        help="add the Kernel Inception Distance (unbiased "
                             "at small n; needs --weights and --ref-dir)")
    args, overrides = parser.parse_known_args(
        sys.argv[1:] if argv is None else list(argv))

    from psld_tpu.cli._common import bootstrap

    cfg = bootstrap(overrides)

    from psld_tpu.eval.sweep import run_sweep

    return run_sweep(
        cfg.dataset.diffusion,
        samplers=[s for s in args.samplers.split(",") if s],
        nfes=[int(x) for x in args.nfes.split(",") if x],
        strides=[s for s in args.strides.split(",") if s],
        out_dir=args.out_dir,
        ref_dir=args.ref_dir,
        ref_stats=args.ref_stats,
        weights=args.weights,
        fid_batch=args.fid_batch,
        swd=args.swd,
        kid=args.kid,
    )


cli = _console(main)


if __name__ == "__main__":
    main()
