"""Low-NFE guided-sampling steering table on the learned demo model.

Round-1 proved classifier guidance steers at the reference operating
point (cc_em_sde, 1000 NFE, clf_temp=10: 128/128 samples to the target
class). Round-3 asks (VERDICT #4) whether the LOW-NFE samplers steer:
cc_em_sde and cc_ei_ode at NFE in {30, 100} over a clf_temp sweep, on the
16k-step score checkpoint + 3k-step noise-conditional classifier
(scripts/tpu_r3_prepare.py artifacts).

Metric (same as round 1): the classifier's own top-1 at t~0 — apply the
clf to the sampler's final phase-space state at diffusion time ``eps``
and count argmax == target label. Also records inter-sample diversity
(per-pixel std over the batch) to show steering is not collapse, and
wall-clock/compile per program.

One JSON line per (sampler, nfe, temp) -> scripts/results_steering_r3.jsonl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_steering_table.py
Env: PSLD_R3_DIR (default /tmp/psld_r3), PSLD_STEER_N (default 128),
     PSLD_STEER_TEMPS (default "1,3,10,30"), PSLD_STEER_NFES ("30,100"),
     PSLD_STEER_SAMPLERS ("cc_em_sde,cc_ei_ode").

Reference anchor: main/eval/class_cond_sample.py:28-36 (the guided
entry point whose steering this quantifies).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

R3 = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
N = int(os.environ.get("PSLD_STEER_N", 128))
TEMPS = [float(x) for x in
         os.environ.get("PSLD_STEER_TEMPS", "1,3,10,30").split(",")]
NFES = [int(x) for x in
        os.environ.get("PSLD_STEER_NFES", "30,100").split(",")]
SAMPLERS = os.environ.get(
    "PSLD_STEER_SAMPLERS", "cc_em_sde,cc_ei_ode").split(",")
TARGET = int(os.environ.get("PSLD_STEER_LABEL", 3))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_steering_r3.jsonl")

DEMO = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={R3}",
    "dataset.diffusion.model.score_fn.nf=64",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=2",
    "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
    "dataset.clf.model.clf_fn.nf=64",
    "dataset.clf.model.clf_fn.ch_mult=[1,2]",
    "dataset.clf.model.clf_fn.num_res_blocks=2",
    "dataset.clf.model.clf_fn.n_cls=10",
]


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def latest_ckpt(results: str) -> str:
    ckpts = sorted(c for c in glob.glob(f"{results}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {results}"
    return ckpts[-1]


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.data.datasets import SDELatentDataset
    from psld_tpu.eval.generate import load_eval_state, make_score_fn
    from psld_tpu.registry import get_module
    from psld_tpu.samplers.base import make_timesteps
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_clf_model, build_sde
    from psld_tpu.train.state import init_state, make_optimizer

    # PSLD_STEER_SCORE picks the score checkpoint dir (default the 16k
    # f32 demo; "score_bf16" = the 30k bf16-trained run); PSLD_STEER_BF16=1
    # runs score+guidance networks in bf16 (the evaluation.bf16 contract) —
    # the VERDICT classifier stays f32 so the measurement itself is
    # precision-independent
    score_ckpt = latest_ckpt(os.path.join(
        R3, os.environ.get("PSLD_STEER_SCORE", "score")))
    clf_ckpt = latest_ckpt(os.path.join(R3, "clf"))
    cfg = compose(DEMO + [
        f"dataset.diffusion.evaluation.chkpt_path={score_ckpt}",
        "dataset.diffusion.evaluation.sample_from=target",
        f"dataset.diffusion.evaluation.batch_size={N}",
        f"dataset.diffusion.evaluation.n_samples={N}",
        f"dataset.clf.evaluation.chkpt_path={clf_ckpt}",
        f"dataset.clf.evaluation.label_to_sample={TARGET}",
    ]).dataset
    dcfg = cfg.diffusion

    steer_bf16 = os.environ.get("PSLD_STEER_BF16", "0") == "1"
    sde = build_sde(dcfg)
    net, params = load_eval_state(dcfg)
    score_fn = make_score_fn(net, params, bf16=steer_bf16)

    clf_net, clf_params_init = build_clf_model(cfg.clf)
    clf_state = ckpt.restore_checkpoint(
        str(cfg.clf.evaluation.chkpt_path),
        init_state(clf_params_init,
                   make_optimizer(cfg.clf.training.optimizer)))
    clf_fn = make_score_fn(clf_net, clf_state.params)  # f32 verdict
    clf_guide_fn = make_score_fn(clf_net, clf_state.params,
                                 bf16=steer_bf16)

    # merged eval view the guided samplers read clf_temp etc. from
    from psld_tpu.eval.generate import _merged_eval_config

    latent = SDELatentDataset(sde, dcfg)
    eps = float(dcfg.evaluation.eval_eps)

    @jax.jit
    def top1_and_div(z_final):
        # classifier's own verdict on the final phase-space state at
        # diffusion time ~0 (its most in-distribution query point)
        tv = jnp.full((z_final.shape[0],), eps, jnp.float32)
        logits = clf_fn(z_final.astype(jnp.float32), tv)
        pred = jnp.argmax(logits, axis=-1)
        x_part = z_final[..., : z_final.shape[-1] // 2]
        div = jnp.mean(jnp.std(x_part, axis=0))
        return pred, div

    for name in SAMPLERS:
        sampler_cls = get_module("samplers", name)
        for temp in TEMPS:
            mcfg = compose(DEMO + [
                f"dataset.diffusion.evaluation.chkpt_path={score_ckpt}",
                f"dataset.diffusion.evaluation.batch_size={N}",
                f"dataset.clf.evaluation.chkpt_path={clf_ckpt}",
                f"dataset.clf.evaluation.label_to_sample={TARGET}",
                f"dataset.clf.evaluation.clf_temp={temp}",
            ]).dataset
            merged = _merged_eval_config(mcfg)
            sampler = sampler_cls(merged, sde, score_fn,
                                  clf_fn=clf_guide_fn,
                                  y=TARGET)
            for nfe in NFES:
                ts = make_timesteps(nfe, eps, sde.T,
                                    str(dcfg.evaluation.stride_type))
                key = jax.random.PRNGKey(7)
                z0 = latent.sample_batch(jax.random.fold_in(key, 1), N)
                run = jax.jit(lambda k, z: sampler.sample(k, z, ts, nfe))
                t0 = time.time()
                z = run(jax.random.fold_in(key, 0), z0)
                pred, div = top1_and_div(z)
                pred = np.asarray(pred)
                el = time.time() - t0
                emit({"phase": "steering", "sampler": name, "nfe": nfe,
                      "bf16": steer_bf16,
                      "score_dir": os.environ.get("PSLD_STEER_SCORE",
                                                  "score"),
                      "clf_temp": temp, "n": N, "label": TARGET,
                      "top1_rate": round(float(np.mean(pred == TARGET)), 4),
                      "pred_hist": np.bincount(pred, minlength=10).tolist(),
                      "diversity_std": round(float(div), 4),
                      "elapsed_s": round(el, 1)})
    emit({"phase": "steering_done"})


if __name__ == "__main__":
    main()
