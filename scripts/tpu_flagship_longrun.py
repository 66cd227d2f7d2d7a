"""Flagship (97.6M) long-run training demo under the full production stack.

Round-3 trained the flagship for only 2k steps (stability, not
convergence); the convergence proof lived on the 11.5x-smaller demo
model. This run closes that (round-3 verdict, weak #3 / next #5): the
full SOTA CIFAR-10 recipe (ch_mult=[2,2,2], 8 resblocks/level, FIR,
Fourier embeddings, residual progressive input, dropout 0.15 — the
reference's scripts_psld/sota/uncond/cifar10/train_uncond_psld.sh
architecture) trained from scratch on synthetic data for N steps (default
20k) at bs128 with the production TPU knobs: ``training.bf16=true`` AND
``model.score_fn.dropout_impl=hw_inline`` (the counter-hash mask the
round-4 convergence gate validates at demo scale; the inline lowering
is bit-identical to the gated ``hw`` arm). Then samples 256
images at 1000-NFE EM from the settled EMA and gates pixel statistics
against the data reference.

Usage (TPU host):
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/tpu_flagship_longrun.py
Env: PSLD_R3_DIR (default /tmp/psld_r3; uses its data_ref),
     PSLD_FLAGSHIP_STEPS (default 20000),
     PSLD_FLAGSHIP_DROPOUT_IMPL (default hw_inline).
Rows -> scripts/results_flagship_longrun.jsonl. Auto-resumes
(restore_path=latest) if the tunnel dies mid-run — relaunch the same
command.
"""

from __future__ import annotations

import glob
import json
import os
import time

OUT = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
STEPS = int(os.environ.get("PSLD_FLAGSHIP_STEPS", 20000))
IMPL = os.environ.get("PSLD_FLAGSHIP_DROPOUT_IMPL", "hw_inline")
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_flagship_longrun.jsonl")


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


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    res = os.path.join(OUT, "flagship")
    overrides = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={OUT}",
        # the SOTA architecture (train_uncond_psld.sh overrides)
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
        # production TPU knobs
        f"+dataset.diffusion.model.score_fn.dropout_impl={IMPL}",
        "+dataset.diffusion.training.bf16=True",
        "dataset.diffusion.training.batch_size=128",
        "dataset.diffusion.training.epochs=1000000",
        "dataset.diffusion.training.chkpt_interval=250",
        "dataset.diffusion.training.restore_path=latest",
        "dataset.diffusion.training.ema_decay=0.999",
        "+dataset.diffusion.training.steps_per_dispatch=8",
        f"dataset.diffusion.training.results_dir={res}",
    ]
    cfg = compose(overrides).dataset.diffusion
    t0 = time.time()
    state = train_sde(cfg, max_steps=STEPS)
    train_s = time.time() - t0
    ckpts = sorted(c for c in glob.glob(f"{res}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    ckpt = ckpts[-1]
    losses = []
    for c in ckpts:
        part = c.rsplit("loss=", 1)
        if len(part) == 2:
            try:
                losses.append(float(part[1]))
            except ValueError:
                pass
    steps_done = int(state.step)
    emit({"phase": "flagship_train", "bf16": True, "dropout_impl": IMPL,
          "batch": 128, "steps": steps_done,
          "wall_s": round(train_s, 1),
          "img_per_s_incl_compile": round(steps_done * 128 / train_s, 1),
          "checkpoint": ckpt, "loss_trace_per_chkpt": losses[-16:]})

    # settled-EMA sampling at 1000 NFE through the production eval path
    # (bs64 keeps each EM dispatch ~30 s — under the worker watchdog)
    from psld_tpu.eval.generate import sample

    scfg = compose(overrides + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
        "dataset.diffusion.evaluation.sample_from=target",
        "+dataset.diffusion.evaluation.bf16=true",
        "dataset.diffusion.evaluation.batch_size=64",
        "dataset.diffusion.evaluation.n_samples=256",
        "dataset.diffusion.evaluation.n_discrete_steps=1000",
        "+dataset.diffusion.evaluation.nfe_per_dispatch=250",
        f"dataset.diffusion.evaluation.save_path={OUT}/samples_flagship",
        "dataset.diffusion.evaluation.sample_prefix=flagship",
    ]).dataset.diffusion
    t0 = time.time()
    sample(scfg)
    sample_s = time.time() - t0
    img_dir = (glob.glob(f"{OUT}/samples_flagship/images")
               + glob.glob(f"{OUT}/samples_flagship/*/images"))[0]

    from psld_tpu.utils.images import load_images_rgb

    gen = load_images_rgb(sorted(glob.glob(f"{img_dir}/*.png"))) / 255.0
    gs = pixel_stats(gen)
    rec = {"phase": "flagship_sample", "nfe": 1000, "bf16": True,
           "n": int(gen.shape[0]), "wall_s": round(sample_s, 1),
           "stats": gs}
    ref_pngs = sorted(glob.glob(f"{OUT}/data_ref/*.png"))
    if ref_pngs:
        rs = pixel_stats(load_images_rgb(ref_pngs) / 255.0)
        rec["data_stats"] = rs
        rec["delta_vs_data"] = {k: round(abs(gs[k] - rs[k]), 4) for k in gs}
    emit(rec)


if __name__ == "__main__":
    main()
