"""Round-4 on-chip measurements (VERDICT r3 items 1, 3, 4).

Phases (args; default all):
  hw_step      — flagship bf16 bs128 donated train step, in-session A/B:
                 dropout=0 ceiling, dropout_impl=save_mask, dropout_impl=hw
                 (the NEW counter-hash kernel — the round-3 +17% was the
                 prng kernel, re-measure after the SPMD rewrite), plus a
                 `hw_passthrough` cell (threshold forced to 0: identical
                 kernel launches, all-keep mask) that splits the remaining
                 gap into pallas-boundary traffic vs masking marginal.
  nfe1000_bs128 — DIRECT bs128 1000-NFE EM sampling via segmented
                 dispatches (evaluation.nfe_per_dispatch mechanics;
                 round-3 extrapolated this point because the single-scan
                 dispatch exceeded the ~60 s worker watchdog). Validates
                 segmented-vs-single bit identity on-chip at bs64 first.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_r4_measure.py
Rows -> scripts/results_r4.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_r4.jsonl")
V5E_PEAK = 197e12
# XLA cost model, flagship train step @ bs128 (PARITY round-2 item 9)
STEP_TFLOPS_BS128 = 27.95
# XLA cost model, flagship forward @ bs64 / bs128 (PARITY round-2 item 9)
FWD_TFLOPS = {64: 4.653, 128: 9.306}

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


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def build_step(extra, bs, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    ovr = SOTA_CIFAR + ["+dataset.diffusion.training.bf16=True"] + extra
    cfg = compose(ovr).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 6), jnp.float32),
                            jnp.full((1,), 0.5, jnp.float32))
    rng = np.random.default_rng(seed)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02), shapes)
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=True)
    return step_fn, init_state(params, optimizer)


def timed_steps(step_fn, state, bs, n_iters=10):
    import jax
    import jax.numpy as jnp

    batch = jax.random.normal(jax.random.PRNGKey(1), (bs, 32, 32, 3),
                              jnp.float32)
    t0 = time.time()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
    float(metrics["loss"])
    return compile_s, (time.time() - t0) / n_iters


def phase_hw_step():
    cells = [
        ("ceiling_dropout0",
         ["dataset.diffusion.model.score_fn.dropout=0.0"]),
        ("save_mask",
         ["+dataset.diffusion.model.score_fn.dropout_impl=save_mask"]),
        ("hw", ["+dataset.diffusion.model.score_fn.dropout_impl=hw"]),
        ("hw_passthrough",
         ["+dataset.diffusion.model.score_fn.dropout_impl=hw"]),
        # same counter-hash mask, inline jnp lowering: XLA fuses the
        # hash+select into neighboring epilogues (no pallas_call boundary)
        ("hw_inline",
         ["+dataset.diffusion.model.score_fn.dropout_impl=hw_inline"]),
    ]
    only = os.environ.get("PSLD_HW_CELLS")
    if only:
        keep = set(only.split(","))
        cells = [c for c in cells if c[0] in keep]
    for name, extra in cells:
        if name == "hw_passthrough":
            # identical pallas launches, all-keep mask: isolates the
            # kernel-boundary HBM traffic + fusion break from the masking
            import psld_tpu.ops.dropout as dmod

            dmod._masked_op.cache_clear()
            orig = dmod._threshold
            dmod._threshold = lambda rate: 0
        try:
            step_fn, state = build_step(extra, 128)
            compile_s, el = timed_steps(step_fn, state, 128)
        finally:
            if name == "hw_passthrough":
                dmod._threshold = orig
                dmod._masked_op.cache_clear()
        emit({"phase": "hw_step", "cell": name, "bf16": True, "batch": 128,
              "donate": True, "compile_s": round(compile_s, 1),
              "sec_per_step": round(el, 4),
              "img_per_s": round(128 / el, 1),
              "mfu": round(STEP_TFLOPS_BS128 * 1e12 / el / V5E_PEAK, 4)})


def seg_run(factory, params, sde, make_timesteps, bs, nfe, nfe_pd,
            n_timing=1):
    """Segmented EM sampling run (evaluation.nfe_per_dispatch mechanics
    hand-rolled for measurement scripts): returns (compile_s, sec/run,
    final batch).  Shared by phase_nfe1000_bs128 and
    scripts/tpu_bs_sweep_sampling.py so the chunking/jit/timing logic has
    exactly one copy."""
    import jax
    import numpy as np

    n_eff = nfe - 1
    ts = make_timesteps(n_eff, 1e-3)
    probe = factory(params)
    xs = probe.segment_xs(ts, True, 1e-3)
    n_rows = int(jax.tree_util.tree_leaves(xs)[0].shape[0])
    chunks = [jax.tree_util.tree_map(lambda a: a[i:i + nfe_pd], xs)
              for i in range(0, n_rows, nfe_pd)]
    seg = jax.jit(lambda p, c, ch: jax.lax.scan(
        factory(p).segment_body, c, ch)[0])
    fin = jax.jit(lambda p, c, ts_: factory(p).segment_finalize(
        c, ts_, True, 1e-3))
    z = sde.prior_sampling(jax.random.PRNGKey(1), (bs, 32, 32, 3))

    def run(key):
        carry = (z, key)
        for ch in chunks:
            carry = seg(params, carry, ch)
        return np.asarray(fin(params, carry, ts))

    t0 = time.time()
    out = run(jax.random.PRNGKey(2))  # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_timing):
        out = run(jax.random.PRNGKey(3))
    el = (time.time() - t0) / n_timing
    return compile_s, el, out


def _build_sampler(bs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.registry import get_module
    from psld_tpu.samplers import make_timesteps
    from psld_tpu.train.loop import build_score_model, build_sde

    cfg = compose(SOTA_CIFAR + [
        "dataset.diffusion.model.sde.nu=4.02",
        "dataset.diffusion.model.sde.gamma=0.02",
    ]).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((bs, 32, 32, 6), jnp.float32),
                            jnp.full((bs,), 0.5, jnp.float32))
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02), shapes)

    sampler_cls = get_module("samplers", "em_sde")

    def factory(p):
        p16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, p)
        score = lambda zz, tt: net.apply(
            p16, zz.astype(jnp.bfloat16), tt).astype(jnp.float32)
        return sampler_cls(cfg, sde, score)

    return cfg, sde, factory, params, make_timesteps


def phase_nfe1000_bs128():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg, sde, factory, params, make_timesteps = _build_sampler(128)

    def _seg(bs, nfe, nfe_pd):
        _, el, out = seg_run(factory, params, sde, make_timesteps,
                             bs, nfe, nfe_pd)
        return el, out

    # 1) on-chip bit-identity at a watchdog-safe point (bs64, NFE 250)
    el_seg, out_seg = _seg(64, 250, 50)
    single = jax.jit(lambda p, k, z, ts_: factory(p).sample(
        k, z, ts_, 249, denoise=True, eps=1e-3))
    ts250 = make_timesteps(249, 1e-3)
    z64 = sde.prior_sampling(jax.random.PRNGKey(1), (64, 32, 32, 3))
    out_single = np.asarray(single(params, jax.random.PRNGKey(3), z64,
                                   ts250))
    # warm was PRNGKey(2); timing run used PRNGKey(3) — compare that one
    bit_equal = bool((out_seg == out_single).all())
    emit({"phase": "nfe1000_bs128", "cell": "onchip_bit_identity",
          "batch": 64, "nfe": 250, "nfe_per_dispatch": 50,
          "bit_identical": bit_equal})
    assert bit_equal, "segmented != single-scan on chip"

    # 2) the previously-unmeasurable point: bs128 x NFE-1000, directly
    for bs, nfe_pd in ((128, 250), (64, 250)):
        el, out = _seg(bs, 1000, nfe_pd)
        assert np.isfinite(out).all()
        mfu = FWD_TFLOPS[bs] * 1000 * 1e12 / el / V5E_PEAK
        emit({"phase": "nfe1000_bs128", "cell": f"bs{bs}_nfe1000_seg",
              "batch": bs, "nfe": 1000, "nfe_per_dispatch": nfe_pd,
              "bf16": True, "wall_s": round(el, 2),
              "img_per_s": round(bs / el, 4), "mfu": round(mfu, 4)})


def phase_ei3_identity():
    """Order-3 EI-ODE segmentation identity ON CHIP: the CPU test gates
    o3-below-stability-floor with an allclose (XLA's trip-count-1 scan
    unrolling contracts FMAs differently there); this records that the
    TPU backend compiles the chunked scans with identical rounding, so
    even o3 is bit-exact. Exact-score Gaussian (no network): runs in
    seconds."""
    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    from test_samplers import make_psld, psld_exact_score_fn

    from psld_tpu.samplers.base import make_timesteps, segmented_sample
    from psld_tpu.samplers.ode import EIODESampler

    for order in (2, 3):
        cfg, sde = make_psld(n_steps=20, sampler_extra={
            "name": "ei_ode", "order": order})
        s = EIODESampler(cfg, sde, psld_exact_score_fn(sde, 0.8))
        ts = make_timesteps(20, 1e-3)
        z = sde.prior_sampling(jax.random.PRNGKey(0), (4, 4, 4, 1))
        ref = np.asarray(s.sample(jax.random.PRNGKey(11), z, ts, 20))
        for k in (1, 7):
            seg = np.asarray(segmented_sample(
                s, jax.random.PRNGKey(11), z, ts, rows_per_dispatch=k))
            emit({"phase": "ei3_identity", "order": order,
                  "rows_per_dispatch": k,
                  "bit_identical": bool((seg == ref).all()),
                  "max_abs_diff": float(np.abs(seg - ref).max())})

    # likelihood steps_per_dispatch identity on chip (same unrolling
    # caveat on CPU — tests/test_likelihood.py gates at 1e-12 there)
    import jax.numpy as jnp

    from test_likelihood import (SIGMA0, make_vpsde,
                                 vpsde_gaussian_score_fn)

    from psld_tpu.eval.likelihood import make_likelihood_fn

    sde = make_vpsde()
    fn = make_likelihood_fn(sde, vpsde_gaussian_score_fn(sde, SIGMA0),
                            n_steps=16, eps=1e-5, method="heun", n_probes=2)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 4, 4, 1), jnp.float64) * SIGMA0
    ref = jax.jit(fn)(key, x)
    ts = np.asarray(fn.segment_ts())
    xs_full = (ts[:-1], ts[1:])
    seg_step = jax.jit(lambda c, ch: jax.lax.scan(fn.segment_body, c, ch)[0])
    for spd in (1, 5):
        carry = jax.jit(fn.segment_init)(key, x)
        for i in range(0, ts.shape[0] - 1, spd):
            carry = seg_step(carry, tuple(a[i:i + spd] for a in xs_full))
        out = jax.jit(fn.segment_finalize)(carry)
        emit({"phase": "seg_identity", "mode": "likelihood",
              "steps_per_dispatch": spd,
              "bit_identical": bool(
                  (np.asarray(out["logp"]) == np.asarray(ref["logp"])).all()),
              "max_abs_diff": float(np.abs(
                  np.asarray(out["logp"]) - np.asarray(ref["logp"])).max())})


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    phases = sys.argv[1:] or ["hw_step", "nfe1000_bs128"]
    for ph in phases:
        {"hw_step": phase_hw_step,
         "nfe1000_bs128": phase_nfe1000_bs128,
         "ei3_identity": phase_ei3_identity}[ph]()
    emit({"phase": "r4_measure_done"})


if __name__ == "__main__":
    main()
