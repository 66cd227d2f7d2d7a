"""Train-step MFU experiments on one chip (round-3: attack the 44.7%).

Round-2 measured the SOTA CIFAR-10 train step at bs128 = 317 ms (403
img/s, 44.7% MFU vs the v5e bf16 peak) and attributed the gap to the
backward convolutions + optimizer bandwidth without trying the levers.
This script measures them:

  phase "matrix": {f32, bf16} x {scan_blocks off, on} at bs128 —
      compile_s (first dispatch, tunneled backend), sec_per_step (10
      steps, host value fetch), img/s, MFU from the XLA cost model of the
      jitted TRAIN STEP (fwd+bwd+Adam+EMA, lowered on CPU — the flop
      count is backend-independent). scan rows double as the VERDICT #3
      compile-time experiment.
  phase "drift": 200 steps from one init, f32 vs bf16 (master weights f32
      in both) on a fixed synthetic batch stream; loss every 10 steps,
      reported as per-point relative differences.
  phase "afhq_attn": afhqv2-128 (nf=160 family, attention C=320 — not a
      lane multiple) train step bs8 with the lane-padded Pallas attention
      vs PSLD_NO_FUSED_ATTN=1 einsum fallback.

One JSON line per row -> scripts/results_mfu_r3.jsonl (+ stdout).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_mfu_experiments.py [phase ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_mfu_r3.jsonl")
V5E_PEAK = 197e12

SOTA_CIFAR = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.root='/tmp'",
    "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=8",
    "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
    "dataset.diffusion.model.score_fn.dropout=0.15",
    "dataset.diffusion.model.score_fn.progressive_input='residual'",
    "dataset.diffusion.model.score_fn.fir=True",
    "dataset.diffusion.model.score_fn.embedding_type='fourier'",
]
SOTA_AFHQ = [
    "+dataset=afhqv2/afhqv2128_psld",
    "dataset.diffusion.data.root='/tmp'",
]


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def build_step(overrides, bs, bf16=False, scan=False, remat=False, seed=0,
               donate=False):
    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    import jax
    import jax.numpy as jnp
    import numpy as np

    ovr = list(overrides)
    if bf16:
        ovr.append("+dataset.diffusion.training.bf16=True")
    if scan:
        ovr.append("+dataset.diffusion.model.score_fn.scan_blocks=True")
    if remat:
        ovr.append("+dataset.diffusion.model.score_fn.remat=True")
    cfg = compose(ovr).dataset.diffusion
    size = int(cfg.data.image_size)
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    x0 = jnp.zeros((1, size, size, 6), jnp.float32)
    t0 = jnp.full((1,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    rng = np.random.default_rng(seed)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02), shapes)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=donate)
    state = init_state(params, optimizer)
    return step_fn, state, size, n_params


def step_flops(which, bf16, scan):
    """XLA cost-model flops of the full jitted train step, lowered on CPU
    in a subprocess (flop count is backend-independent; the tunneled
    backend has no client-side cost analysis)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               PSLD_MFU_COST_ONLY=f"{which}:{int(bf16)}:{int(scan)}")
    try:
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, timeout=1800)
        return float(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def cost_only(spec):
    import jax
    import jax.numpy as jnp

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.import_modules_into_registry()

    which, bf16, scan = spec.split(":")
    overrides, bs = ((SOTA_CIFAR, 128) if which == "cifar"
                     else (SOTA_AFHQ, 8))
    step_fn, state, size, _ = build_step(overrides, bs, bf16 == "1",
                                         scan == "1")
    batch = jnp.zeros((bs, size, size, 3), jnp.float32)
    cost = jax.jit(step_fn).lower(
        state, batch, jax.random.PRNGKey(2)).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(float(cost["flops"]))


def timed_steps(step_fn, state, bs, size, n_iters=10):
    import jax

    import jax.numpy as jnp

    batch = jax.random.normal(jax.random.PRNGKey(1), (bs, size, size, 3),
                              jnp.float32)
    t0 = time.time()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    float(metrics["loss"])  # host fetch forces execution on the tunnel
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
    float(metrics["loss"])
    el = (time.time() - t0) / n_iters
    return compile_s, el, state


_COMPILED = {}  # (bf16, scan) -> (step_fn, size) — drift reuses matrix's

# the scan body saves every per-iteration intermediate for backward, so
# scan WITHOUT remat OOMs HBM at bs128 (measured: 49.40 GB vs 15.75 GB) —
# scan rows pair with per-block remat, with a remat-only row as the fair
# step-time comparator
MATRIX = [
    # (bf16, scan, remat)
    (False, False, False),
    (False, False, True),
    (False, True, True),
    (True, False, False),
    (True, True, True),
]


def phase_matrix():
    flops = None
    for bf16, scan, remat in MATRIX:
        step_fn, state, size, n_params = build_step(
            SOTA_CIFAR, 128, bf16, scan, remat)
        compile_s, el, _ = timed_steps(step_fn, state, 128, size)
        if not remat:
            _COMPILED[(bf16, scan)] = (step_fn, size)
        if flops is None:
            # identical MODEL math in every variant (bf16 changes dtypes,
            # scan program structure, remat adds recompute — MFU counts
            # model flops) — lower on CPU once
            flops = step_flops("cifar", bf16, scan)
        rec = {"phase": "matrix", "bf16": bf16, "scan_blocks": scan,
               "remat": remat,
               "batch": 128, "params_m": round(n_params / 1e6, 1),
               "compile_s": round(compile_s, 1),
               "sec_per_step": round(el, 4),
               "img_per_s": round(128 / el, 1)}
        if flops:
            rec["step_tflops"] = round(flops / 1e12, 3)
            rec["mfu_vs_v5e_bf16_peak"] = round(
                flops / el / V5E_PEAK, 4)
        emit(rec)


def phase_drift():
    import jax
    import jax.numpy as jnp

    curves = {}
    for bf16 in (False, True):
        # fresh state from one shared init; reuse the step program the
        # matrix phase compiled (identical config -> jit cache hit)
        new_fn, state, size, _ = build_step(SOTA_CIFAR, 128, bf16,
                                            scan=False, seed=0)
        step_fn = _COMPILED.get((bf16, False), (new_fn, size))[0]
        losses = []
        for i in range(200):
            batch = jax.random.normal(jax.random.PRNGKey(1000 + i // 10),
                                      (128, size, size, 3), jnp.float32)
            state, metrics = step_fn(state, batch,
                                     jax.random.PRNGKey(2000 + i))
            if (i + 1) % 10 == 0:
                losses.append(round(float(metrics["loss"]), 5))
        curves[bf16] = losses
    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(curves[True], curves[False])]
    emit({"phase": "drift", "steps": 200, "every": 10,
          "loss_f32": curves[False], "loss_bf16": curves[True],
          "rel_diff_max": round(max(rel), 4),
          "rel_diff_final": round(rel[-1], 4)})


def phase_afhq_attn():
    for fallback in (False, True):
        os.environ.pop("PSLD_NO_FUSED_ATTN", None)
        # the padded kernel lost this comparison, so odd widths now
        # default to the fallback — force the padded path for its row
        os.environ["PSLD_PAD_ATTN"] = "1"
        if fallback:
            os.environ["PSLD_NO_FUSED_ATTN"] = "1"
        step_fn, state, size, n_params = build_step(SOTA_AFHQ, 8)
        compile_s, el, _ = timed_steps(step_fn, state, 8, size)
        emit({"phase": "afhq_attn", "attention":
              "einsum_fallback" if fallback else "pallas_lane_padded",
              "batch": 8, "image_size": size,
              "params_m": round(n_params / 1e6, 1),
              "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(8 / el, 1)})
    os.environ.pop("PSLD_NO_FUSED_ATTN", None)
    os.environ.pop("PSLD_PAD_ATTN", None)


def phase_bf16_capacity():
    """Does bf16's halved activation traffic unlock larger no-remat
    batches? Round-2: f32 bs256 no-remat needs 17.0 GB (OOM on the 16 GB
    v5e) and only executes with per-block remat + donated buffers at
    915 ms/step. Measure bf16 at bs {192, 256} without remat (donated
    buffers, like the round-2 remat row) + the bf16+remat comparator."""
    flops128 = step_flops("cifar", True, False)
    for bs, remat in ((192, False), (256, False), (256, True)):
        try:
            step_fn, state, size, n_params = build_step(
                SOTA_CIFAR, bs, bf16=True, remat=remat, donate=True)
            compile_s, el, _ = timed_steps(step_fn, state, bs, size)
        except Exception as e:  # noqa: BLE001 — record OOMs as data
            emit({"phase": "bf16_capacity", "batch": bs, "remat": remat,
                  "donate": True, "error": str(e)[:300]})
            continue
        rec = {"phase": "bf16_capacity", "batch": bs, "remat": remat,
               "donate": True, "params_m": round(n_params / 1e6, 1),
               "compile_s": round(compile_s, 1),
               "sec_per_step": round(el, 4),
               "img_per_s": round(bs / el, 1)}
        if flops128:
            flops = flops128 * bs / 128  # conv/attn flops scale with batch
            rec["step_tflops"] = round(flops / 1e12, 3)
            rec["mfu_vs_v5e_bf16_peak"] = round(flops / el / V5E_PEAK, 4)
        emit(rec)


def phase_prng():
    """Is dropout's threefry RNG a measurable slice of the bf16 step?
    Rows: the bf16 bs128 baseline re-measured in this process, dropout=0
    (no RNG, no mask traffic), and — when launched with
    JAX_DEFAULT_PRNG_IMPL=rbg (env must precede jax import; use the
    `prng_rbg` phase alias in a fresh process) — the cheaper hardware RNG
    at dropout=0.15."""
    import jax

    impl = str(jax.config.jax_default_prng_impl)
    for dropout in (0.15, 0.0) if impl == "threefry2x32" else (0.15,):
        ovr = SOTA_CIFAR + [
            f"dataset.diffusion.model.score_fn.dropout={dropout}"]
        step_fn, state, size, n_params = build_step(ovr, 128, bf16=True)
        compile_s, el, _ = timed_steps(step_fn, state, 128, size)
        emit({"phase": "prng", "prng_impl": impl, "dropout": dropout,
              "dropout_impl": ("remat"
                               if os.environ.get("PSLD_DROPOUT_REMAT")
                               == "1" else "save_mask"),
              "bf16": True, "batch": 128,
              "params_m": round(n_params / 1e6, 1),
              "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(128 / el, 1)})


def phase_dropout_impl():
    """RematDropout (regenerate mask in backward) vs stock nn.Dropout vs
    no dropout, bf16 bs128, donated buffers (the remat variant OOMed HBM
    at donate=False — the checkpoint saves a 2-byte activation where the
    stock path saves a 1-byte mask)."""
    cells = [("save_mask", 0.15), ("remat", 0.15), ("save_mask", 0.0)]
    for impl, dropout in cells:
        os.environ.pop("PSLD_DROPOUT_REMAT", None)
        if impl == "remat":
            os.environ["PSLD_DROPOUT_REMAT"] = "1"
        ovr = SOTA_CIFAR + [
            f"dataset.diffusion.model.score_fn.dropout={dropout}"]
        try:
            step_fn, state, size, n_params = build_step(ovr, 128, bf16=True,
                                                        donate=True)
            compile_s, el, _ = timed_steps(step_fn, state, 128, size)
        except Exception as e:  # noqa: BLE001 — record OOMs as data
            emit({"phase": "dropout_impl", "dropout_impl": impl,
                  "dropout": dropout, "bf16": True, "batch": 128,
                  "donate": True, "error": str(e)[:300]})
            continue
        emit({"phase": "dropout_impl", "dropout_impl": impl,
              "dropout": dropout, "bf16": True, "batch": 128,
              "donate": True, "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(128 / el, 1)})
    os.environ.pop("PSLD_DROPOUT_REMAT", None)


def phase_dropout_pallas():
    """HWDropout (Pallas hardware-PRNG kernel, mask regenerated in the
    backward — ops/dropout.py) vs stock nn.Dropout, bf16 bs128, donated.
    Unlike the refuted jax.checkpoint variant, the Pallas backward reads
    ONLY the cotangent: per site the mask residual's HBM write+read
    disappears. First validates the kernel's fwd/bwd mask identity and
    drop statistics on-chip, then microbenchmarks the op alone, then the
    full-step A/B."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.ops.dropout import hw_dropout

    # --- kernel validation on the real chip ---
    x = jnp.ones((2048, 128), jnp.bfloat16)
    seed = jax.random.key_data(jax.random.PRNGKey(5)).reshape(-1).astype(
        jnp.uint32)
    y = hw_dropout(x, seed, 0.15, True)
    g = jax.grad(lambda h: hw_dropout(
        h, seed, 0.15, True).astype(jnp.float32).sum())(x)
    ya, ga = np.asarray(y, np.float32), np.asarray(g, np.float32)
    drop_frac = float((ya == 0).mean())
    mask_match = bool(((ya == 0) == (ga == 0)).all())
    det = bool((np.asarray(hw_dropout(x, seed, 0.15, True), np.float32)
                == ya).all())
    emit({"phase": "dropout_pallas", "cell": "kernel_validate",
          "drop_frac": round(drop_frac, 4), "fwd_bwd_mask_match":
          mask_match, "deterministic": det})
    assert mask_match and det and abs(drop_frac - 0.15) < 0.02

    # --- op microbench: value+grad of dropout alone on a resblock-sized
    # activation (bs128 x 32 x 32 x 256 bf16), pallas vs stock select ---
    h = jax.random.normal(jax.random.PRNGKey(0),
                          (128, 32, 32, 256)).astype(jnp.bfloat16)

    def stock(h, key):
        keep = jax.random.bernoulli(key, 0.85, h.shape)
        out = jnp.where(keep, h / 0.85, 0)
        return (out.astype(jnp.float32) ** 2).sum()

    def pallas(h, seed):
        out = hw_dropout(h, seed, 0.15, True)
        return (out.astype(jnp.float32) ** 2).sum()

    key = jax.random.PRNGKey(9)
    for name, fn, arg in (("stock", stock, key), ("pallas", pallas, seed)):
        f = jax.jit(jax.value_and_grad(fn))
        float(f(h, arg)[0])
        t0 = time.time()
        for _ in range(30):
            v, _ = f(h, arg)
        float(v)
        us = (time.time() - t0) / 30 * 1e6
        emit({"phase": "dropout_pallas", "cell": f"microbench_{name}",
              "value_and_grad_us": round(us, 1),
              "shape": "128x32x32x256_bf16"})

    # --- full flagship step A/B (in-session baseline; ~10% session
    # spread makes cross-session comparison unreliable) ---
    for impl in ("save_mask", "pallas"):
        os.environ.pop("PSLD_DROPOUT_PALLAS", None)
        if impl == "pallas":
            os.environ["PSLD_DROPOUT_PALLAS"] = "1"
        step_fn, state, size, n_params = build_step(SOTA_CIFAR, 128,
                                                    bf16=True, donate=True)
        compile_s, el, _ = timed_steps(step_fn, state, 128, size)
        emit({"phase": "dropout_pallas", "cell": f"step_{impl}",
              "dropout": 0.15, "bf16": True, "batch": 128, "donate": True,
              "params_m": round(n_params / 1e6, 1),
              "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(128 / el, 1)})
    os.environ.pop("PSLD_DROPOUT_PALLAS", None)


SOTA_HQ256 = [
    "+dataset=celebahq/celebahq256_psld",
    "dataset.diffusion.data.root='/tmp'",
]


def phase_hires_bf16():
    """Does bf16 pay MORE at 256px, where the step is HBM-bound?
    (celebahq256 sampling measured 19-27% MFU — bandwidth-roofed; bf16
    halves activation traffic, so training should gain more than the
    MXU-bound 32px case's 26%.) f32 vs bf16 at bs2/chip, with per-block
    remat (the 256px training default) and donated buffers."""
    for bf16 in (False, True):
        try:
            step_fn, state, size, n_params = build_step(
                SOTA_HQ256, 2, bf16=bf16, remat=True, donate=True)
            compile_s, el, _ = timed_steps(step_fn, state, 2, size,
                                           n_iters=5)
        except Exception as e:  # noqa: BLE001 — record OOMs as data
            emit({"phase": "hires_bf16", "bf16": bf16, "batch": 2,
                  "image_size": 256, "remat": True, "donate": True,
                  "error": str(e)[:300]})
            continue
        emit({"phase": "hires_bf16", "bf16": bf16, "batch": 2,
              "image_size": 256, "remat": True, "donate": True,
              "params_m": round(n_params / 1e6, 1),
              "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(2 / el, 2)})


def phase_spd():
    """Production step time: the matrix rows dispatch one step at a time,
    paying the tunnel round-trip per step. steps_per_dispatch=8 (the
    production setting, CLAUDE.md) folds 8 steps into one program —
    measure the per-step wall under it to separate device time from
    dispatch latency."""
    import jax
    import jax.numpy as jnp

    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_multi_train_step

    import numpy as np

    spd = 8
    ovr = SOTA_CIFAR + ["+dataset.diffusion.training.bf16=True"]
    cfg = compose(ovr).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    x0 = jnp.zeros((1, 32, 32, 6), jnp.float32)
    t0 = jnp.full((1,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02), shapes)
    step_fn, optimizer = make_multi_train_step(net, sde, criterion, cfg,
                                               spd, donate=False)
    state = init_state(params, optimizer)
    batches = jax.random.normal(jax.random.PRNGKey(1),
                                (spd, 128, 32, 32, 3), jnp.float32)
    t_c = time.time()
    state, metrics = step_fn(state, batches, jax.random.PRNGKey(2))
    float(metrics["loss"][-1])
    compile_s = time.time() - t_c
    n_disp = 5
    t_s = time.time()
    for i in range(n_disp):
        state, metrics = step_fn(state, batches, jax.random.PRNGKey(3 + i))
    float(metrics["loss"][-1])
    el = (time.time() - t_s) / (n_disp * spd)
    emit({"phase": "spd", "bf16": True, "batch": 128,
          "steps_per_dispatch": spd,
          "compile_s": round(compile_s, 1),
          "sec_per_step": round(el, 4),
          "img_per_s": round(128 / el, 1)})


def main():
    spec = os.environ.get("PSLD_MFU_COST_ONLY")
    if spec:
        cost_only(spec)
        return
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    phases = sys.argv[1:] or ["matrix", "drift", "afhq_attn"]
    for ph in phases:
        {"matrix": phase_matrix, "drift": phase_drift,
         "afhq_attn": phase_afhq_attn,
         "bf16_capacity": phase_bf16_capacity,
         "prng": phase_prng, "prng_rbg": phase_prng,
         "dropout_impl": phase_dropout_impl,
         "dropout_pallas": phase_dropout_pallas,
         "hires_bf16": phase_hires_bf16,
         "spd": phase_spd}[ph]()
    emit({"phase": "mfu_experiments_done"})


if __name__ == "__main__":
    main()
