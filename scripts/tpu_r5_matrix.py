"""Flagship sampler-quality matrix (round-5 verdict item 1).

Runs {em_sde, sscs_sde, sscs2m_sde, ei_ode(o2)} x NFE x {uniform,
quadratic} on the round-5 flagship checkpoint (97.6M SOTA CIFAR-10
recipe, 20k steps under the production stack — scripts/
tpu_flagship_longrun.py) through the PRODUCTION sweep driver
(psld_tpu.eval.sweep.run_sweep): segmented dispatches
(nfe_per_dispatch=50) keep every device dispatch well under the ~60 s
worker watchdog at bs64, and the NFE-independent segmented-program cache
(eval/generate.py seg_sig) compiles each sampler's programs once for the
whole NFE column. Per cell: throughput + weight-free quality (pixel
stats + SWD vs the 256-PNG data_ref). The per-cell PNG directories under
$PSLD_R5_DIR/matrix are the FID archive: generation is seed-deterministic,
so real-weight FID is a pure post-process (scripts/repro_fid.sh) the day
Inception weights + real data arrive.

This is the reference's FID-vs-NFE study (scripts_psld/sota/uncond/
cifar10/sample_uncond_psld.sh:31-33) at the production scale the bench
sells — round 4 only had it on the 11.5x-smaller demo model.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_r5_matrix.py
Env: PSLD_R5_DIR (default /tmp/psld_r5), PSLD_MATRIX_N (default 2048).
Rows -> scripts/results_r5_matrix.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = os.environ.get("PSLD_R5_DIR", "/tmp/psld_r5")
N = int(os.environ.get("PSLD_MATRIX_N", 2048))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_r5_matrix.jsonl")

# (sampler, uniform NFEs, quadratic NFEs). sscs2m/ei get only their
# documented stability regimes (sde_samplers.py / ode.py docstrings).
PLAN = [
    ("em_sde", [20, 50, 100, 250, 1000], [20, 50, 100]),
    ("sscs_sde", [20, 50, 100, 250, 1000], [20, 50, 100]),
    ("sscs2m_sde", [20, 50, 100], [20, 50, 100]),
    ("ei_ode", [20, 50, 100, 250], [20, 50]),
]

SOTA_ARCH = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={OUT}",
    "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=8",
    "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
    "dataset.diffusion.model.score_fn.dropout=0.15",
    "dataset.diffusion.model.score_fn.progressive_input='residual'",
    "dataset.diffusion.model.score_fn.fir=True",
    "dataset.diffusion.model.score_fn.embedding_type='fourier'",
]


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    from psld_tpu.config import compose
    from psld_tpu.eval.sweep import run_sweep

    ckpts = sorted(
        c for c in glob.glob(f"{OUT}/flagship/checkpoints/*epoch=*")
        if not c.endswith(".meta.json"))
    assert ckpts, f"no flagship checkpoint under {OUT} — run " \
                  "scripts/tpu_flagship_longrun.py first"
    ckpt = ckpts[-1]
    ref_dir = os.path.join(OUT, "data_ref")
    matrix_dir = os.path.join(OUT, "matrix")
    emit({"phase": "matrix_start", "checkpoint": ckpt, "n_per_cell": N})

    cfg = compose(SOTA_ARCH + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
        "dataset.diffusion.evaluation.sample_from=target",
        "+dataset.diffusion.evaluation.bf16=true",
        "dataset.diffusion.evaluation.batch_size=64",
        f"dataset.diffusion.evaluation.n_samples={N}",
        "+dataset.diffusion.evaluation.nfe_per_dispatch=50",
        "dataset.diffusion.evaluation.save_mode=image",
        f"dataset.diffusion.evaluation.save_path={matrix_dir}",
    ]).dataset.diffusion

    from psld_tpu.eval.generate import load_eval_state

    preloaded = load_eval_state(cfg)
    jit_cache = {}  # shared across ALL cells: seg programs compile once
    def cell_done(sampler, nfe, stride):
        tag = f"{sampler}_nfe{nfe}_{stride}"
        pngs = glob.glob(os.path.join(matrix_dir, tag, "images", "*.png"))
        return len(pngs) >= N

    for sampler, uni, quad in PLAN:
        for stride, all_nfes in (("uniform", uni), ("quadratic", quad)):
            # resume after a tunnel crash: skip cells already on disk
            nfes = [n for n in all_nfes
                    if not cell_done(sampler, n, stride)]
            if not nfes:
                emit({"phase": "matrix_col_skip", "sampler": sampler,
                      "stride": stride, "reason": "cells complete"})
                continue
            t0 = time.time()
            try:
                rows = run_sweep(cfg, [sampler], nfes, [stride],
                                 matrix_dir, ref_dir=ref_dir, swd=True,
                                 preloaded=preloaded, jit_cache=jit_cache)
            except Exception as e:
                emit({"phase": "matrix_cell_error", "sampler": sampler,
                      "stride": stride, "nfes": nfes, "error": repr(e)})
                continue
            for r in rows:
                emit(dict({"phase": "matrix"}, **r))
            emit({"phase": "matrix_col_done", "sampler": sampler,
                  "stride": stride, "wall_s": round(time.time() - t0, 1)})

    emit({"phase": "matrix_done", "checkpoint": ckpt,
          "archive": matrix_dir})


if __name__ == "__main__":
    main()
