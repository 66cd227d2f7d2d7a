"""On-chip SSCS vs SSCS-2M cost check: the multistep sampler adds one
score-term transport (two 2x2 scalar-mat muls on the state) per step over
SSCS — it must be throughput-neutral, since both run 1 NFE/step on the
flagship 97.6M CIFAR-10 net. Prints one JSON line per (sampler, nfe).

Run as ONE process (tunneled-backend compiles are minutes each).

Usage: python scripts/tpu_sscs2m_measure.py [--nfes 100] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfes", default="100")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.samplers import make_timesteps
    from psld_tpu.samplers.sde_samplers import SSCS2MSampler, SSCSSampler
    from psld_tpu.sde.psld import PSLD
    from psld_tpu.train.loop import build_score_model

    nf = int(os.environ.get("PSLD_MEASURE_NF", 128))  # CPU smoke: set 8
    blocks = 8 if nf >= 128 else 1
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.root='/tmp'",
        f"dataset.diffusion.model.score_fn.nf={nf}",
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        f"dataset.diffusion.model.score_fn.num_res_blocks={blocks}",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
    ]).dataset.diffusion
    sde = PSLD(cfg)
    net = build_score_model(cfg)

    batch = args.batch
    x0 = jnp.zeros((2, 32, 32, 6), jnp.float32)
    t0 = jnp.full((2,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    host = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(host.standard_normal(s.shape)
                              .astype(s.dtype) * 0.02), shapes)

    for nfe in (int(n) for n in args.nfes.split(",")):
        ts = make_timesteps(nfe - 1, 1e-3)
        z = sde.prior_sampling(jax.random.PRNGKey(0),
                               (batch, 32, 32, 3), jnp.float32)
        for name, cls in (("sscs_sde", SSCSSampler),
                          ("sscs2m_sde", SSCS2MSampler)):
            # params must be a jit ARGUMENT: closing over them bakes the
            # weights into the remote-compile request body (HTTP 413)
            def run(params, k, z, cls=cls, ts=ts, n=nfe - 1):
                smp = cls(cfg, sde,
                          lambda zz, tt: net.apply(params, zz, tt))
                return smp.sample(k, z, ts, n)

            fn = jax.jit(run)
            t_c = time.time()
            out = fn(params, jax.random.PRNGKey(1), z)
            _ = float(jnp.sum(out))  # host fetch forces completion
            compile_s = time.time() - t_c
            t = time.time()
            out = fn(params, jax.random.PRNGKey(2), z)
            _ = float(jnp.sum(out))
            dt = time.time() - t
            print(json.dumps({
                "phase": f"{name}_nfe{nfe}_bs{batch}",
                "compile_s": round(compile_s, 1),
                "s_per_batch": round(dt, 2),
                "img_per_s": round(batch / dt, 3),
                "finite": bool(np.isfinite(np.asarray(out)).all()),
            }), flush=True)


if __name__ == "__main__":
    main()
