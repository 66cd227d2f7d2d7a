"""Convergence gate for the hw (Pallas counter-hash) dropout impl.

The hw kernel's masks are statistically equivalent to nn.Dropout's but
not bit-identical (counter hash vs threefry), so a lockstep drift test
cannot apply. Instead, the same gate the bf16 lever got
(scripts/tpu_bf16_longrun.py): train the learning-demo recipe (nf=64
PSLD HSM, synthetic data, bs128, dropout 0.15) from the SAME init for N
steps once per dropout impl, compare the loss traces, then sample 256
images at 1000-NFE EM from each settled EMA and compare pixel statistics
(mean/std/TV/diversity) against the data reference and each other.
Equivalent regularization ==> traces within seed noise and both sample
sets on-data.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/tpu_dropout_convergence.py
Env: PSLD_R3_DIR (default /tmp/psld_r3), PSLD_DCONV_STEPS (default 10000).
Rows append to scripts/results_dropout_convergence.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import time

OUT = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
STEPS = int(os.environ.get("PSLD_DCONV_STEPS", 10000))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_dropout_convergence.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def pixel_stats(imgs):
    import numpy as np

    x = np.asarray(imgs, dtype=np.float64)
    tv = (np.abs(np.diff(x, axis=1)).mean()
          + np.abs(np.diff(x, axis=2)).mean()) / 2.0
    return {"mean": round(float(x.mean()), 4),
            "std": round(float(x.std()), 4),
            "tv": round(float(tv), 4),
            "diversity": round(float(x.std(axis=0).mean()), 4)}


def overrides(impl: str, res: str):
    return [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={OUT}",
        "dataset.diffusion.model.score_fn.nf=64",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        f"+dataset.diffusion.model.score_fn.dropout_impl={impl}",
        "dataset.diffusion.training.batch_size=128",
        "dataset.diffusion.training.epochs=1000000",
        "dataset.diffusion.training.chkpt_interval=100",
        "dataset.diffusion.training.restore_path=latest",
        "dataset.diffusion.training.ema_decay=0.999",
        "+dataset.diffusion.training.steps_per_dispatch=8",
        "+dataset.diffusion.training.bf16=True",
        f"dataset.diffusion.training.results_dir={res}",
    ]


def loss_trace(res: str):
    """(epoch-ordered checkpoint losses) from the checkpoint filenames."""
    losses = []
    for c in sorted(glob.glob(f"{res}/checkpoints/*epoch=*")):
        if c.endswith(".meta.json"):
            continue
        part = c.rsplit("loss=", 1)
        if len(part) == 2:
            try:
                losses.append(float(part[1]))
            except ValueError:
                pass
    return losses


def run_arm(impl: str):
    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample
    from psld_tpu.train.loop import train_sde
    from psld_tpu.utils.images import load_images_rgb

    res = os.path.join(OUT, f"dconv_{impl}")
    ov = overrides(impl, res)
    cfg = compose(ov).dataset.diffusion
    t0 = time.time()
    state = train_sde(cfg, max_steps=STEPS)
    train_s = time.time() - t0
    trace = loss_trace(res)
    ckpts = sorted(c for c in glob.glob(f"{res}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    ckpt = ckpts[-1]
    emit({"phase": "dropout_convergence", "cell": "train", "impl": impl,
          "steps": int(state.step), "wall_s": round(train_s, 1),
          "loss_trace_per_chkpt": trace, "checkpoint": ckpt})

    scfg = compose(ov + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
        "dataset.diffusion.evaluation.sample_from=target",
        "dataset.diffusion.evaluation.batch_size=128",
        "dataset.diffusion.evaluation.n_samples=256",
        "dataset.diffusion.evaluation.n_discrete_steps=1000",
        f"dataset.diffusion.evaluation.save_path={OUT}/dconv_samples_{impl}",
        f"dataset.diffusion.evaluation.sample_prefix={impl}",
    ]).dataset.diffusion
    t0 = time.time()
    sample(scfg)
    sample_s = time.time() - t0
    img_dir = (glob.glob(f"{OUT}/dconv_samples_{impl}/images")
               + glob.glob(f"{OUT}/dconv_samples_{impl}/*/images"))[0]
    gen = load_images_rgb(sorted(glob.glob(f"{img_dir}/*.png"))) / 255.0
    gs = pixel_stats(gen)
    emit({"phase": "dropout_convergence", "cell": "sample", "impl": impl,
          "nfe": 1000, "n": int(gen.shape[0]),
          "sample_wall_s": round(sample_s, 1), "stats": gs})
    return trace, gs


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    from psld_tpu.utils.images import load_images_rgb

    ref_pngs = sorted(glob.glob(f"{OUT}/data_ref/*.png"))
    ref_stats = None
    if ref_pngs:
        ref_stats = pixel_stats(load_images_rgb(ref_pngs) / 255.0)
        emit({"phase": "dropout_convergence", "cell": "data_ref",
              "n": len(ref_pngs), "stats": ref_stats})

    stock_trace, stock_stats = run_arm("save_mask")
    hw_trace, hw_stats = run_arm("hw")

    n = min(len(stock_trace), len(hw_trace))
    tail = max(1, n // 4)
    rel = max(abs(a - b) / max(abs(a), 1e-6)
              for a, b in zip(stock_trace[n - tail:], hw_trace[n - tail:]))
    verdict = {"phase": "dropout_convergence", "cell": "verdict",
               "steps": STEPS,
               "tail_rel_loss_gap": round(rel, 4),
               "stats_delta": {k: round(abs(stock_stats[k] - hw_stats[k]), 4)
                               for k in stock_stats}}
    if ref_stats:
        verdict["hw_vs_data_delta"] = {
            k: round(abs(hw_stats[k] - ref_stats[k]), 4) for k in hw_stats}
        verdict["stock_vs_data_delta"] = {
            k: round(abs(stock_stats[k] - ref_stats[k]), 4)
            for k in stock_stats}
    emit(verdict)


if __name__ == "__main__":
    main()
