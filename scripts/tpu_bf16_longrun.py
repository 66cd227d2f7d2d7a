"""bf16 long-run stability: a full training run with the production knobs.

The round-3 drift study covered 200 lockstep steps; this trains the demo
recipe (nf=64 PSLD HSM, synthetic data, bs128) from scratch for 30k steps
ENTIRELY under ``training.bf16=true`` on the chip, then samples 256 images
at 1000-NFE EM from the settled EMA and compares pixel statistics against
the data reference — the same convergence gate the round-2 learning demo
used for f32 (PARITY "End-to-end validation": TV 0.0311 vs data 0.0312).

One JSON line per phase -> scripts/results_bf16_longrun.jsonl.
Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_bf16_longrun.py
Env: PSLD_R3_DIR (default /tmp/psld_r3; uses its data_ref), PSLD_BF16_STEPS
     (default 30000).
"""

from __future__ import annotations

import glob
import json
import os
import time

OUT = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
STEPS = int(os.environ.get("PSLD_BF16_STEPS", 30000))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_bf16_longrun.jsonl")


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

    res = os.path.join(OUT, "score_bf16")
    overrides = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={OUT}",
        "dataset.diffusion.model.score_fn.nf=64",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.training.batch_size=128",
        "dataset.diffusion.training.epochs=1000000",
        "dataset.diffusion.training.chkpt_interval=250",
        "dataset.diffusion.training.restore_path=latest",
        "dataset.diffusion.training.ema_decay=0.999",
        "+dataset.diffusion.training.steps_per_dispatch=8",
        "+dataset.diffusion.training.bf16=True",
        f"dataset.diffusion.training.results_dir={res}",
    ]
    cfg = compose(overrides).dataset.diffusion
    t0 = time.time()
    state = train_sde(cfg, max_steps=STEPS)
    train_s = time.time() - t0
    ckpts = sorted(c for c in glob.glob(f"{res}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    ckpt = ckpts[-1]
    # loss trace from the checkpoint metas (loss=... in the filename)
    losses = []
    for c in ckpts:
        part = c.rsplit("loss=", 1)
        if len(part) == 2:
            try:
                losses.append(float(part[1]))
            except ValueError:
                pass
    emit({"phase": "train", "bf16": True, "steps": int(state.step),
          "wall_s": round(train_s, 1), "checkpoint": ckpt,
          "loss_trace_per_chkpt": losses[-12:]})

    # settled-EMA sampling at 1000 NFE through the production eval path
    from psld_tpu.eval.generate import sample

    scfg = compose(overrides + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
        "dataset.diffusion.evaluation.sample_from=target",
        "dataset.diffusion.evaluation.batch_size=128",
        "dataset.diffusion.evaluation.n_samples=256",
        "dataset.diffusion.evaluation.n_discrete_steps=1000",
        f"dataset.diffusion.evaluation.save_path={OUT}/samples_bf16",
        "dataset.diffusion.evaluation.sample_prefix=bf16",
    ]).dataset.diffusion
    t0 = time.time()
    sample(scfg)
    sample_s = time.time() - t0
    # eval.generate.sample writes {save_path}/[path_prefix/]images
    img_dir = (glob.glob(f"{OUT}/samples_bf16/images")
               + glob.glob(f"{OUT}/samples_bf16/*/images"))[0]

    from psld_tpu.utils.images import load_images_rgb

    gen = load_images_rgb(sorted(glob.glob(f"{img_dir}/*.png"))) / 255.0
    ref = load_images_rgb(
        sorted(glob.glob(f"{OUT}/data_ref/*.png"))) / 255.0
    gs, rs = pixel_stats(gen), pixel_stats(ref)
    emit({"phase": "sample_quality", "nfe": 1000, "n": int(gen.shape[0]),
          "sample_wall_s": round(sample_s, 1), "generated": gs, "data": rs,
          "delta": {k: round(abs(gs[k] - rs[k]), 4) for k in gs}})
    emit({"phase": "bf16_longrun_done"})


if __name__ == "__main__":
    main()
