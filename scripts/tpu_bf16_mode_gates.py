"""bf16 quality gates for the previously-ungated inference modes.

Round-3 shipped ``evaluation.bf16`` with quality gates for uncond
sampling (dTV 0.0000) and guided steering only, while the celebahq256
extension recipes default bf16 for EVERY mode — so inpainting, editing,
and likelihood ran bf16 on an ungated path (round-3 verdict, weak #5).
This script closes that: each mode runs twice on the learned demo
checkpoint (scripts/tpu_r3_prepare.py) with IDENTICAL seeds — once f32,
once ``evaluation.bf16=true`` — through the exact production entry
points (eval/generate.py::{inpaint,edit}, eval/likelihood.evaluate_nll),
and the f32-vs-bf16 drift in pixel statistics / known-region agreement /
bits-per-dim is the gate (reference surfaces: main/eval/inpaint.py:29-35
for inpainting; likelihood has no reference equivalent —
main/models/sde/psld.py:372 leaves prior_logp ``pass``).

Usage (TPU host):
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/tpu_bf16_mode_gates.py [inpaint] [edit] [likelihood]
Env: PSLD_R3_DIR (default /tmp/psld_r3 — needs score/checkpoints).
Rows -> scripts/results_bf16_gates.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

R3 = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_bf16_gates.jsonl")

DEMO = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={R3}",
    "dataset.diffusion.model.score_fn.nf=64",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=2",
    "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
]


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


def latest_ckpt(results: str) -> str:
    ckpts = sorted(c for c in glob.glob(f"{results}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {results}"
    return ckpts[-1]


def load_pngs(d):
    from psld_tpu.utils.images import load_images_rgb

    paths = sorted(glob.glob(os.path.join(d, "*.png")))
    return load_images_rgb(paths) / 255.0


def _arm_cfg(mode: str, bf16: bool, extra):
    from psld_tpu.config import compose

    tag = f"{mode}_{'bf16' if bf16 else 'f32'}"
    save = os.path.join(R3, "bf16_gates", tag)
    ov = DEMO + [
        f"dataset.diffusion.evaluation.chkpt_path={latest_ckpt(os.path.join(R3, 'score'))}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.seed=7",
        "dataset.diffusion.evaluation.n_samples=128",
        "dataset.diffusion.evaluation.batch_size=128",
        "dataset.diffusion.evaluation.n_discrete_steps=1000",
    ] + extra
    if bf16:
        ov.append("+dataset.diffusion.evaluation.bf16=true")
    return compose(ov).dataset.diffusion, save


def gate_inpaint():
    from psld_tpu.eval.generate import inpaint

    out = {}
    for bf16 in (False, True):
        cfg, save = _arm_cfg(
            "inpaint", bf16,
            ["dataset.diffusion.evaluation.sampler.name=ip_em_sde"])
        t0 = time.time()
        n = inpaint(cfg)
        wall = time.time() - t0
        gen = load_pngs(os.path.join(save, "images"))
        corrupt = load_pngs(os.path.join(save, "corrupt"))
        import numpy as np

        # known-region fidelity: where the corrupt image is not blanked,
        # the output must carry the source content in both precisions
        stats = pixel_stats(gen)
        stats["known_mae_vs_corrupt"] = round(
            float(np.abs(gen - corrupt)[corrupt > 0].mean()), 4)
        out[bf16] = stats
        emit({"phase": "bf16_gate", "mode": "inpaint", "bf16": bf16,
              "n": int(n), "nfe": 1000, "wall_s": round(wall, 1),
              "stats": stats})
    emit({"phase": "bf16_gate", "mode": "inpaint", "cell": "delta",
          "delta": {k: round(abs(out[True][k] - out[False][k]), 4)
                    for k in out[False]}})


def gate_edit():
    from psld_tpu.eval.generate import edit

    out = {}
    for bf16 in (False, True):
        cfg, save = _arm_cfg(
            "edit", bf16,
            ["dataset.diffusion.evaluation.sampler.name=edit_em_sde",
             "+dataset.diffusion.evaluation.sampler.edit_t0=0.4"])
        t0 = time.time()
        n = edit(cfg)
        wall = time.time() - t0
        stats = pixel_stats(load_pngs(os.path.join(save, "images")))
        out[bf16] = stats
        emit({"phase": "bf16_gate", "mode": "edit", "bf16": bf16,
              "n": int(n), "nfe": 1000, "edit_t0": 0.4,
              "wall_s": round(wall, 1), "stats": stats})
    emit({"phase": "bf16_gate", "mode": "edit", "cell": "delta",
          "delta": {k: round(abs(out[True][k] - out[False][k]), 4)
                    for k in out[False]}})


def gate_likelihood():
    from psld_tpu.eval.likelihood import evaluate_nll

    out = {}
    for bf16 in (False, True):
        cfg, _ = _arm_cfg(
            "likelihood", bf16,
            ["+dataset.diffusion.evaluation.likelihood.n_steps=50",
             "+dataset.diffusion.evaluation.likelihood.solver=rk4",
             "+dataset.diffusion.evaluation.likelihood.n_probes=1",
             "dataset.diffusion.evaluation.n_samples=256",
             "dataset.diffusion.evaluation.batch_size=128"])
        t0 = time.time()
        bpd = evaluate_nll(cfg)
        wall = time.time() - t0
        out[bf16] = float(bpd)
        emit({"phase": "bf16_gate", "mode": "likelihood", "bf16": bf16,
              "grid": "rk4/50", "n": 256, "bits_per_dim": round(float(bpd), 4),
              "wall_s": round(wall, 1)})
    emit({"phase": "bf16_gate", "mode": "likelihood", "cell": "delta",
          "bpd_drift": round(abs(out[True] - out[False]), 4)})


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    gates = {"inpaint": gate_inpaint, "edit": gate_edit,
             "likelihood": gate_likelihood}
    for name in (sys.argv[1:] or list(gates)):
        gates[name]()
    emit({"phase": "bf16_gates_done"})


if __name__ == "__main__":
    main()
