"""Training throughput: SOTA CIFAR-10 PSLD step/sec and img/sec on one chip.

Runs the full jitted train step (t-sampling -> HSM loss -> grad -> clip ->
Adam+warmup -> EMA) on the 97.6M-param NCSN++ at the reference's per-device
batch of 16 (scripts_psld/sota/uncond/cifar10/train_uncond_psld.sh:29) and
at larger batches to show the TPU operating point. Prints one JSON line per
batch size. Not the driver bench (see bench.py); this is the training-side
companion number.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.root='/tmp'",
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
    ]).dataset.diffusion

    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)

    x0 = jnp.zeros((1, 32, 32, 6), jnp.float32)
    t0 = jnp.full((1,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02),
        shapes,
    )

    # bf16 mixed precision measured +26% step throughput at <=1e-4 loss
    # drift (PARITY round-3 section 2); dropout_impl=hw_inline (the
    # counter-hash mask regenerated in backward, lowered inline) another
    # +31% over stock dropout (PARITY round-4 section 1) — bench each at
    # the operating point only (every extra program costs ~5 min of
    # remote compile). The last arm is the recommended TPU recipe.
    for bf16, impl, sizes in ((False, "save_mask", (16, 64, 128)),
                              (True, "save_mask", (128,)),
                              (True, "hw_inline", (128,))):
        cfg.model.score_fn["dropout_impl"] = impl
        net = build_score_model(cfg)
        cfg.training["bf16"] = bf16
        step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                             donate=False)
        for bs in sizes:
            state = init_state(params, optimizer)
            batch = jax.random.normal(jax.random.PRNGKey(1),
                                      (bs, 32, 32, 3), jnp.float32)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
            # fetch a scalar to force execution: on tunneled runtimes
            # block_until_ready can return before execution finishes
            float(metrics["loss"])
            n_iters = 5
            t_start = time.time()
            for i in range(n_iters):
                state, metrics = step_fn(state, batch,
                                         jax.random.PRNGKey(3 + i))
            # the final loss depends on the chained state -> all steps ran
            float(metrics["loss"])
            el = (time.time() - t_start) / n_iters
            print(json.dumps({
                "metric": "train step",
                "bf16": bf16,
                "dropout_impl": impl,
                "batch": bs,
                "sec_per_step": round(el, 4),
                "img_per_sec": round(bs / el, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
