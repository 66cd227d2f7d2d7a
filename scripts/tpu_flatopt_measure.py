"""A/B: training.optimizer.flatten on the flagship train step (1 chip).

Measures whether collapsing the per-leaf Adam kernel chains into one
fused pass over a flat buffer (optax.flatten) recovers any of the
~20 ms bandwidth-bound optimizer/EMA tail (PARITY.md round-1
decomposition). Prints one JSON line per arm.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_flatopt_measure.py
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

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    arms = {"both": (False, True), "default": (False,), "flat": (True,)}[
        sys.argv[2] if len(sys.argv) > 2 else "both"]
    for flat in arms:
        cfg.training.optimizer["flatten"] = flat
        step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                             donate=True)
        state = init_state(params, optimizer)
        batch = jax.random.normal(jax.random.PRNGKey(1), (bs, 32, 32, 3),
                                  jnp.float32)
        t_c = time.time()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        loss0 = float(metrics["loss"])  # host fetch forces execution
        compile_s = time.time() - t_c
        n_iters = 10
        t_start = time.time()
        for i in range(n_iters):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
        loss = float(metrics["loss"])
        el = (time.time() - t_start) / n_iters
        print(json.dumps({
            "arm": "flatten" if flat else "default",
            "batch": bs,
            "sec_per_step": round(el, 4),
            "img_per_sec": round(bs / el, 2),
            "first_loss": round(loss0, 4),
            "last_loss": round(loss, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        del state, step_fn


if __name__ == "__main__":
    main()
