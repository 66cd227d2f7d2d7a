"""Sampling batch-size sweep between the two measured bench points.

The headline bench (bs64 EM-1000 bf16) measures 79.4% MFU and bs128
77.1% (measured segmented, results_r4.jsonl `bs128_nfe1000_seg`) —
nothing between was ever measured. If bs128's loss is capacity
(activation spill), an intermediate batch could beat bs64 and raise the
driver headline; if it's a tiling effect, the curve is monotone and bs64
stays the optimum. Segmented dispatches (evaluation.nfe_per_dispatch
mechanics, measured free at 0.06%) keep every dispatch well under the
~60 s worker watchdog at any batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/tpu_bs_sweep_sampling.py [bs ...]
Rows -> scripts/results_r4.jsonl (phase "bs_sweep_sampling").
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from tpu_r4_measure import (V5E_PEAK, _build_sampler, emit,  # noqa: E402
                            seg_run)

# XLA cost model scales linearly in batch (verified at 64/128:
# 4.653 / 9.306 TFLOP) — interpolate for intermediate batches.
FWD_TFLOPS_PER_IMG = 4.653 / 64


def sweep(bs: int, nfe: int = 1000, nfe_pd: int = 200):
    import numpy as np

    cfg, sde, factory, params, make_timesteps = _build_sampler(bs)
    compile_s, el, out = seg_run(factory, params, sde, make_timesteps,
                                 bs, nfe, nfe_pd)
    assert np.isfinite(out).all()
    mfu = FWD_TFLOPS_PER_IMG * bs * nfe * 1e12 / el / V5E_PEAK
    emit({"phase": "bs_sweep_sampling", "batch": bs, "nfe": nfe,
          "nfe_per_dispatch": nfe_pd, "bf16": True,
          "compile_s": round(compile_s, 1), "wall_s": round(el, 2),
          "img_per_s": round(bs / el, 4), "mfu": round(mfu, 4)})


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()
    for bs in [int(a) for a in (sys.argv[1:] or ["96", "80"])]:
        sweep(bs)
    emit({"phase": "bs_sweep_sampling_done"})


if __name__ == "__main__":
    main()
