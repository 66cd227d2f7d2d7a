"""Benchmark: CIFAR-10 img/sec/chip at 1000-NFE Euler--Maruyama sampling,
plus the production TRAIN step throughput in the same JSON line.

Runs the flagship SOTA CIFAR-10 PSLD configuration (NCSN++ nf=128,
ch_mult=[2,2,2], 8 resblocks, FIR, Fourier embeddings, progressive_input=
residual -- 97.6M params; scripts_psld/sota/uncond/cifar10/*.sh) through
the full compiled EM sampler (single lax.scan, NFE network evaluations)
and reports throughput on one chip. Then (round-5) times the production
train step -- bf16, bs128, dropout_impl=hw_inline, donated buffers (the
measured round-4 operating point) -- so train-perf regressions are
driver-visible, not just sampling ones (the reference's training recipe
is half its value, main/train_sde.py:114). ``train_*`` fields ride the
same single JSON line.

Baseline for ``vs_baseline``: the reference publishes no throughput
numbers (BASELINE.md), so we use an explicit estimate of its 1000-NFE EM
throughput on one V100: ~0.25 img/s (97M-param NCSN++ at batch 16,
~16 ms/fwd => 16 s per 16-image batch x 1000 steps).

Env overrides (CI/smoke): PSLD_BENCH_BATCH, PSLD_BENCH_NFE,
PSLD_BENCH_NF (model width), PSLD_BENCH_TRAIN=0 (skip the train
phase), PSLD_BENCH_TRAIN_BATCH (default 128).
"""

from __future__ import annotations

import json
import os
import time

REF_GPU_IMG_PER_SEC = 0.25


def run_bench(batch: int | None = None, nfe: int | None = None) -> dict:
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    batch = int(os.environ.get("PSLD_BENCH_BATCH", 64)
                if batch is None else batch)
    nfe = int(os.environ.get("PSLD_BENCH_NFE", 1000) if nfe is None else nfe)
    nf = int(os.environ.get("PSLD_BENCH_NF", 128))

    # Dead-backend watchdog: a wedged tunnel (stale client lock, relay
    # outage) hangs EVERY device op forever -- fail fast with a parseable
    # JSON error line instead. A healthy tunnel answers a tiny op well
    # inside the budget (init <60 s measured); PSLD_BENCH_PROBE_S=0
    # disables.
    probe_s = float(os.environ.get("PSLD_BENCH_PROBE_S", 600))
    if probe_s > 0:
        import threading

        done = threading.Event()

        def _probe():
            import jax as _jax
            import jax.numpy as _jnp

            float(_jnp.sum(_jnp.ones((8, 8))))
            done.set()

        threading.Thread(target=_probe, daemon=True).start()
        if not done.wait(probe_s):
            print(json.dumps({
                "metric": f"CIFAR-10 img/sec/chip at {nfe}-NFE EM sampling",
                "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
                "error": ("accelerator backend unreachable: a trivial "
                          f"device op did not complete in {probe_s:.0f}s "
                          "(wedged tunnel?)"),
            }), flush=True)
            os._exit(2)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.registry import get_module
    from psld_tpu.samplers import make_timesteps
    from psld_tpu.train.loop import build_score_model, build_sde

    # gn_bf16 (GroupNorm normalize/act chain in bf16, f32 moment sums) is
    # the bench default since round 5: +8.5% sampling (2.34 vs 2.15
    # img/s, 86.2% MFU) and +7% train, quality-gated on the trained
    # flagship (EM-1000 SWD 21.6 vs 22.1, dTV 0.0002 — PARITY round-5).
    # PSLD_GN_BF16=0 opts back to the stock f32 chain; it is a no-op for
    # f32 runs (PSLD_BENCH_F32=1) by construction.
    gn16 = os.environ.get("PSLD_GN_BF16", "1") != "0"
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.root='/tmp'",
        f"dataset.diffusion.model.score_fn.nf={nf}",
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
        f"+dataset.diffusion.model.score_fn.gn_bf16={gn16}",
        "dataset.diffusion.model.sde.nu=4.02",
        "dataset.diffusion.model.sde.gamma=0.02",
    ]).dataset.diffusion

    sde = build_sde(cfg)
    net = build_score_model(cfg)
    x0 = jnp.zeros((batch, 32, 32, 6), jnp.float32)
    t0 = jnp.full((batch,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)

    # Model-FLOPs for MFU: XLA cost model of ONE network forward at this
    # batch (host-side lowering, no device compile, abstract args only),
    # times the nfe network evaluations in the program. NOTE the cost
    # model counts a lax.scan body once regardless of trip count, so the
    # scan program itself can't be queried directly. Remote backends
    # (axon) return None from client-side cost analysis -- fall back to a
    # CPU-jax subprocess running this same function with
    # PSLD_BENCH_COST_ONLY=1 (which returns right here, before any
    # parameter materialization).
    fwd = jax.jit(lambda p, x, t: net.apply(p, x, t))
    z_abs = jax.ShapeDtypeStruct((batch, 32, 32, 6), jnp.float32)

    def _flops_of(lowered):
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]) if cost is not None else None

    fwd_flops = None
    try:
        fwd_flops = _flops_of(fwd.lower(shapes, z_abs, t0))
    except Exception:
        pass

    do_train = os.environ.get("PSLD_BENCH_TRAIN", "1") != "0"
    train_bs = int(os.environ.get("PSLD_BENCH_TRAIN_BATCH", 128))
    train_step = train_state0 = None
    train_flops = None
    if do_train:
        # the production train operating point (PARITY round-4 item 1):
        # bf16 master-weight step, hw_inline counter-hash dropout, donated
        # buffers
        from psld_tpu.losses import PSLDScoreLoss
        from psld_tpu.train.state import init_state
        from psld_tpu.train.steps import make_train_step

        tcfg = compose([
            "+dataset=cifar10/cifar10_psld",
            "dataset.diffusion.data.root='/tmp'",
            f"dataset.diffusion.model.score_fn.nf={nf}",
            "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=8",
            "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
            "dataset.diffusion.model.score_fn.dropout=0.15",
            "dataset.diffusion.model.score_fn.progressive_input='residual'",
            "dataset.diffusion.model.score_fn.fir=True",
            "dataset.diffusion.model.score_fn.embedding_type='fourier'",
            "+dataset.diffusion.model.score_fn.dropout_impl=hw_inline",
            f"+dataset.diffusion.model.score_fn.gn_bf16={gn16}",
            "+dataset.diffusion.training.bf16=True",
        ]).dataset.diffusion
        tsde = build_sde(tcfg)
        tnet = build_score_model(tcfg)
        criterion = PSLDScoreLoss(tcfg, tsde)
        step_fn, optimizer = make_train_step(tnet, tsde, criterion, tcfg,
                                             donate=True)
        tshapes = jax.eval_shape(
            tnet.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 6), jnp.float32),
            jnp.full((1,), 0.5, jnp.float32))
        abstract_state = jax.eval_shape(
            lambda p: init_state(p, optimizer), tshapes)
        batch_abs = jax.ShapeDtypeStruct((train_bs, 32, 32, 3), jnp.float32)
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        try:
            train_flops = _flops_of(step_fn.lower(abstract_state, batch_abs,
                                                  key_abs))
        except Exception:
            pass
        train_step, train_shapes, train_opt = step_fn, tshapes, optimizer

    if os.environ.get("PSLD_BENCH_COST_ONLY"):
        return {"cost_only": True, "flops": fwd_flops,
                "train_flops": train_flops}
    if fwd_flops is None or (do_train and train_flops is None):
        sub = _cost_via_cpu_subprocess(batch, nfe, nf)
        if fwd_flops is None:
            fwd_flops = sub.get("flops") if sub else None
        if train_flops is None and sub:
            train_flops = sub.get("train_flops")
    program_flops = fwd_flops * nfe if fwd_flops else None

    # Build params host-side from eval_shape: keeps the benchmark to a
    # single on-device compilation (the sampler scan). Sampling throughput
    # is value-independent (no data-dependent control flow).
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02
        ),
        shapes,
    )

    sampler_cls = get_module("samplers", "em_sde")
    n_eff = nfe - 1  # denoise consumes one step (reference wrapper.py:51-54)
    ts = make_timesteps(n_eff, 1e-3)

    # params must be a jit ARGUMENT: closing over them would bake ~390MB of
    # constants into the XLA program.
    # bf16 network inference is the default (the TPU-native dtype, and
    # what the MFU denominator assumes): measured +14.3% over f32 on the
    # same chip/session (1.882 -> 2.151 img/s) with generated pixel
    # statistics indistinguishable from f32 inference on a learned
    # checkpoint (dTV 0.0000 at 1000-NFE; PARITY round-3 section 2).
    # PSLD_BENCH_F32=1 opts back to full-f32.
    bf16 = os.environ.get("PSLD_BENCH_F32", "0") != "1"

    def run(params, k, z):
        if bf16:
            p16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            score = lambda zz, tt: net.apply(
                p16, zz.astype(jnp.bfloat16), tt).astype(jnp.float32)
        else:
            score = lambda zz, tt: net.apply(params, zz, tt)
        sampler = sampler_cls(cfg, sde, score)
        return sampler.sample(k, z, ts, n_eff, denoise=True, eps=1e-3)

    sample = jax.jit(run)

    z = sde.prior_sampling(jax.random.PRNGKey(1), (batch, 32, 32, 3))
    # compile + warmup; time via a host fetch of the result -- on tunneled
    # runtimes block_until_ready can return before execution finishes, so
    # only materializing the value gives a trustworthy wall-clock
    np.asarray(sample(params, jax.random.PRNGKey(2), z))
    t_start = time.time()
    np.asarray(sample(params, jax.random.PRNGKey(3), z))
    elapsed = time.time() - t_start

    value = batch / elapsed
    out = {
        "metric": f"CIFAR-10 img/sec/chip at {nfe}-NFE EM sampling",
        "value": round(value, 4),
        "unit": "img/s",
        "vs_baseline": round(value / REF_GPU_IMG_PER_SEC, 2),
        # vs_baseline divides by an ESTIMATE of the reference's V100
        # throughput (REF_GPU_IMG_PER_SEC above) -- the reference publishes
        # no throughput numbers. Absolute img/s is the measured quantity.
        "baseline_is_estimate": True,
        "bf16": bf16,
        "gn_bf16": gn16,
    }
    v5e_peak = 197e12
    if program_flops is not None:
        # Model FLOP utilization vs one v5e chip's bf16 peak (197 TFLOP/s,
        # public spec): nfe network forwards, EM-update overhead excluded.
        out["model_tflops_per_fwd"] = round(fwd_flops / 1e12, 6)
        out["program_tflops"] = round(program_flops / 1e12, 6)
        out["mfu_vs_v5e_bf16_peak"] = round(
            program_flops / elapsed / v5e_peak, 6)

    if do_train:
        from psld_tpu.train.state import init_state

        rng_t = np.random.default_rng(1)
        tparams = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                rng_t.standard_normal(s.shape).astype(s.dtype) * 0.02),
            train_shapes)
        tstate = init_state(tparams, train_opt)
        tbatch = jnp.asarray(
            rng_t.standard_normal((train_bs, 32, 32, 3)).astype(np.float32))
        tstate, m = train_step(tstate, tbatch, jax.random.PRNGKey(2))
        float(m["loss"])  # compile + warm (host fetch = real barrier)
        n_iters = 10
        t_start = time.time()
        for i in range(n_iters):
            tstate, m = train_step(tstate, tbatch, jax.random.PRNGKey(3 + i))
        float(m["loss"])
        t_el = (time.time() - t_start) / n_iters
        out["train_img_per_s"] = round(train_bs / t_el, 1)
        out["train_batch"] = train_bs
        out["train_bf16"] = True
        out["train_dropout_impl"] = "hw_inline"
        if train_flops:
            out["train_step_tflops"] = round(train_flops / 1e12, 6)
            out["train_mfu_vs_v5e_bf16_peak"] = round(
                train_flops / t_el / v5e_peak, 6)
    return out


def _cost_via_cpu_subprocess(batch: int, nfe: int, nf: int):
    """Lower the identical program on CPU jax (tracing only, no compile) to
    read the XLA cost model's flops -- used when the device backend (axon)
    returns None from client-side cost analysis. Returns None on failure."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ,
               PSLD_BENCH_COST_ONLY="1",
               JAX_PLATFORMS="cpu",
               # drop the axon sitecustomize so JAX_PLATFORMS=cpu sticks
               PYTHONPATH=repo,
               PSLD_BENCH_BATCH=str(batch),
               PSLD_BENCH_NFE=str(nfe),
               PSLD_BENCH_NF=str(nf))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "psld_tpu.eval.bench"],
            env=env, capture_output=True, text=True, timeout=900)
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception:
        return None


def main():
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
