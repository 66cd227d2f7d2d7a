"""On-chip likelihood demonstration.

Trains a small PSLD model on the synthetic dataset, then evaluates the
PF-ODE bits/dim bound on (a) held-out synthetic data and (b) uniform
noise. A model that has learned the data should assign the data a much
lower bound than the noise; an untrained model should not separate them.

Run: python scripts/demo_nll_tpu.py [--steps 3000]
"""

import argparse
import glob
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--results", default="/tmp/psld_nll_demo")
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.eval.likelihood import (
        augmented_nll_bound,
        bits_per_dim,
        make_likelihood_fn,
    )
    from psld_tpu.train.loop import train_sde

    overrides = [
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={args.results}",
        f"dataset.diffusion.training.results_dir={args.results}",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.model.score_fn.nf={args.nf}",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        f"dataset.diffusion.training.batch_size={args.batch}",
        "dataset.diffusion.training.epochs=100000",
        "dataset.diffusion.training.chkpt_interval=100000",
        "+dataset.diffusion.training.steps_per_dispatch=25",
        "dataset.diffusion.training.log_step=100",
    ]
    cfg = compose(overrides).dataset.diffusion

    t0 = time.time()
    state = train_sde(cfg, max_steps=args.steps)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    from psld_tpu.train.loop import build_score_model, build_sde

    sde = build_sde(cfg)
    net = build_score_model(cfg)
    ema = state.ema_params

    def lik_for(p):
        score_fn = lambda z, t: net.apply(p, z, t)
        return make_likelihood_fn(sde, score_fn, n_steps=100, eps=1e-5,
                                  method="rk4", n_probes=1)

    def bound_fn(p, key, x):
        nll, out = augmented_nll_bound(sde, lik_for(p), key, x)
        return nll

    bound_jit = jax.jit(bound_fn)

    from psld_tpu.data.loader import get_dataset

    ds = get_dataset(cfg)
    x_data = jnp.asarray(ds.batch(np.arange(64)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    x_noise = jax.random.uniform(key, x_data.shape, jnp.float32, -1.0, 1.0)

    dim = int(np.prod(x_data.shape[1:]))
    for name, x in [("data", x_data), ("uniform-noise", x_noise)]:
        t1 = time.time()
        nll = np.asarray(bound_jit(ema, key, x))
        bpd = float(np.mean(np.asarray(bits_per_dim(jnp.asarray(nll), dim))))
        print(json.dumps({"split": name, "bits_per_dim": round(bpd, 4),
                          "nll_nats_mean": round(float(nll.mean()), 2),
                          "eval_s": round(time.time() - t1, 1)}))


if __name__ == "__main__":
    main()
