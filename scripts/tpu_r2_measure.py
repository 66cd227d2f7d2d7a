"""Round-2 TPU measurement batch (run as ONE process: compiles on the
tunneled backend are minutes each and the compile cache does not persist).

Measures, in order, printing one JSON line per result:
1. Driver bench at batch 64 (the round metric) -- with program FLOPs/MFU.
2. Bench at batch 128 and 256: does sampling MFU rise with width?
3. Flagship train step at bs128: wall time + cost-model MFU, and a
   fwd-only program to split fwd/bwd+opt time.

Usage: python scripts/tpu_r2_measure.py [--skip-bench] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import time


def bench_suite(batches):
    from psld_tpu.eval.bench import run_bench

    for b in batches:
        out = run_bench(batch=b)
        out["phase"] = f"bench_bs{b}"
        print(json.dumps(out), flush=True)


def _flops_of(jitted, *args):
    """XLA cost-model flops of the lowered program (client-side; returns
    None on backends like axon that don't expose it)."""
    try:
        cost = jitted.lower(*args).cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost["flops"]) if cost is not None else None
    except Exception:
        return None


def train_step_suite(batch=128):
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.sde.psld import PSLD
    from psld_tpu.train.loop import build_score_model
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    nf = int(os.environ.get("PSLD_MEASURE_NF", 128))  # CPU smoke: set 8
    batch = int(os.environ.get("PSLD_MEASURE_BATCH", batch))
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
    criterion = PSLDScoreLoss(cfg, sde)

    x0 = jnp.zeros((2, 32, 32, 6), jnp.float32)
    t0 = jnp.full((2,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    host = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(host.standard_normal(s.shape)
                              .astype(s.dtype) * 0.02), shapes)

    # forward-only first (attribution: fwd vs bwd+opt), as one
    # K-iteration chained scan per dispatch. MUST run before the train
    # phase: donating the train state also donates the params buffers it
    # aliases.
    K = 8
    v5e_peak = 197e12
    tv = jnp.full((batch,), 0.5, jnp.float32)
    xb = jnp.asarray(host.standard_normal((batch, 32, 32, 6))
                     .astype(np.float32))

    def fwd_chain(p, x):
        def body(c, _):
            return net.apply(p, c, tv), None

        return jax.lax.scan(body, x, None, length=K)[0]

    fwd = jax.jit(fwd_chain)
    _ = np.asarray(fwd(params, xb))[0, 0, 0, 0]
    t = time.time()
    out = fwd(params, xb)
    for _ in range(1):
        out = fwd(params, out)
    _ = np.asarray(out)[0, 0, 0, 0]
    dt_f = (time.time() - t) / (2 * K)
    fflops = _flops_of(fwd, params, xb)  # scan body counted once: per-fwd
    rec = {"phase": f"fwd_bs{batch}", "ms": round(dt_f * 1e3, 2)}
    if fflops:
        rec["program_tflops"] = round(fflops / 1e12, 3)
        rec["mfu_vs_v5e_bf16_peak"] = round(fflops / dt_f / v5e_peak, 4)
    print(json.dumps(rec), flush=True)


    # Timing rules for the tunneled backend (CLAUDE.md): K steps per
    # dispatch amortize the ~650 ms dispatch latency; completion is forced
    # by fetching ONE host scalar at the end of a data-dependent chain
    # (block_until_ready is unreliable here).
    K = 8
    from psld_tpu.train.steps import make_multi_train_step

    # donate the state: without donation the in+out copies plus scan
    # internals exhaust the 16 GB HBM at bs128 (measured round 2)
    multi_fn, optimizer = make_multi_train_step(net, sde, criterion, cfg, K,
                                                donate=True)
    state = init_state(params, optimizer)
    data = jnp.asarray(host.standard_normal((K, batch, 32, 32, 3))
                       .astype(np.float32))
    rng = jax.random.PRNGKey(1)

    # flops BEFORE execution: donation invalidates `state` host-side
    flops = _flops_of(multi_fn, state, data, rng)

    s, m = multi_fn(state, data, rng)  # compile + warmup
    _ = float(m["loss"][-1])
    t = time.time()
    for _ in range(2):
        s, m = multi_fn(s, data, rng)
    _ = float(m["loss"][-1])
    dt = (time.time() - t) / (2 * K)
    # the XLA cost model counts a lax.scan body ONCE regardless of trip
    # count, so the K-step program's flops ARE the per-step flops
    rec = {"phase": f"train_step_bs{batch}", "ms": round(dt * 1e3, 1),
           "img_per_s": round(batch / dt, 1)}
    if flops:
        rec["program_tflops"] = round(flops / 1e12, 2)
        rec["mfu_vs_v5e_bf16_peak"] = round(flops / dt / v5e_peak, 4)
    print(json.dumps(rec), flush=True)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--batches", default="64,128,256")
    args = ap.parse_args()

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    if not args.skip_bench:
        bench_suite([int(b) for b in args.batches.split(",")])
    if not args.skip_train:
        train_step_suite()


if __name__ == "__main__":
    main()
