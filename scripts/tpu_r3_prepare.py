"""Round-3 prep: retrain the on-chip demo checkpoints into a FIXED dir.

Round-2 demo artifacts lived in tempdirs and did not survive the round.
Several round-3 items (guided-steering table, likelihood-on-learned-model,
the 50k-sample protocol) need a LEARNED checkpoint, so this script
reproduces the round-2 operating point deterministically:

  1. nf=64 PSLD HSM score model, synthetic data, bs128, 16k steps,
     EMA 0.999 (settled at 16k — the round-2 sweep demo's flagship).
  2. nf=64 noise-conditional classifier, 3k steps (round-1 guidance demo).
  3. 256 data-reference PNGs for weight-free quality metrics.

Auto-resumes (restore_path=latest), so a tunnel outage mid-run is a
relaunch of the same command. Artifacts land under PSLD_R3_DIR
(default /tmp/psld_r3): {score,clf}/checkpoints/psld-*, data_ref/.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_r3_prepare.py
"""

from __future__ import annotations

import glob
import json
import os

OUT = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
SCORE_STEPS = int(os.environ.get("PSLD_R3_SCORE_STEPS", 16000))
CLF_STEPS = int(os.environ.get("PSLD_R3_CLF_STEPS", 3000))


def latest_ckpt(results: str) -> str:
    # score ckpts are psld-*, classifier ckpts are clf-* (reference naming)
    ckpts = sorted(c for c in glob.glob(f"{results}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {results}"
    return ckpts[-1]


def main():
    os.makedirs(OUT, exist_ok=True)

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_clf, train_sde
    from psld_tpu.utils.images import save_as_images

    score_res = os.path.join(OUT, "score")
    clf_res = os.path.join(OUT, "clf")
    overrides = [
        "+dataset=cifar10/cifar10_psld",
        # --- score model: the round-2 16k-step demo recipe ---
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
        f"dataset.diffusion.training.results_dir={score_res}",
        # --- classifier: the round-1 guidance demo recipe ---
        "dataset.clf.data.name=synthetic",
        f"dataset.clf.data.root={OUT}",
        "dataset.clf.model.clf_fn.nf=64",
        "dataset.clf.model.clf_fn.ch_mult=[1,2]",
        "dataset.clf.model.clf_fn.num_res_blocks=2",
        "dataset.clf.model.clf_fn.n_cls=10",
        "dataset.clf.training.batch_size=128",
        "dataset.clf.training.epochs=1000000",
        "dataset.clf.training.chkpt_interval=250",
        "dataset.clf.training.restore_path=latest",
        "+dataset.clf.training.steps_per_dispatch=8",
        f"dataset.clf.training.results_dir={clf_res}",
    ]
    cfg = compose(overrides).dataset

    state = train_sde(cfg.diffusion, max_steps=SCORE_STEPS)
    print(json.dumps({"phase": "score_done", "steps": int(state.step),
                      "checkpoint": latest_ckpt(score_res)}), flush=True)

    cstate = train_clf(cfg, max_steps=CLF_STEPS)
    print(json.dumps({"phase": "clf_done", "steps": int(cstate.step),
                      "checkpoint": latest_ckpt(clf_res)}), flush=True)

    from psld_tpu.registry import get_module

    ds = get_module("datasets", "synthetic")(image_size=32, norm=True)
    ref_dir = os.path.join(OUT, "data_ref")
    os.makedirs(ref_dir, exist_ok=True)
    imgs = np.stack([ds[i][0] if isinstance(ds[i], tuple) else ds[i]
                     for i in range(256)])
    save_as_images(imgs, file_name=os.path.join(ref_dir, "data"),
                   denorm=True)
    print(json.dumps({"phase": "prepare_done", "out": OUT}), flush=True)


if __name__ == "__main__":
    main()
