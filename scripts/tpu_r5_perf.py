"""Round-5 on-chip performance measurements (VERDICT r4 items 2, 3, 5).

Phases (args; default all):
  hires     — attack the 256px roof (celebahq256, 21% MFU in round 4):
              (1) batch curve bs{1,2,4,8} (the afhq128 rows showed 30->78%
              MFU from bs4->bs8 — capacity vs tiling), (2) knob A/Bs at the
              best batch: PSLD_FUSED_GN, PSLD_GN_BF16, both, (3) a micro-op
              roofline table at the 256-level shapes naming which op class
              eats the time (GN / conv3x3 / FIR resample), achieved
              TFLOP/s + GB/s per op — the "per-op trace row" the round-4
              verdict asked for (jax.profiler device traces are not
              available through the tunneled backend).
  adaptive  — first on-chip rows for adaptive_ode (round-4 verdict: zero
              TPU evidence): flagship 32px bs64 bf16, tolerance sweep ->
              NFE / img/s via the bounded-dispatch protocol
              (samplers/ode.py adaptive_init/run/finalize, each dispatch
              capped well under the ~60 s watchdog), vs bb_ode (the SciPy
              host loop it exists to beat) and rk_ode at matched NFE.
  trainattr — per-op attribution of the train-step backward gap (68.3%
              MFU dropout-0 train vs 79.4% forward-only): micro-bench
              fwd / grad-input / grad-filter convs + GN fwd/bwd at the
              flagship's level shapes (bs128 bf16), achieved TFLOP/s per
              class; then whole-step counter-levers: grad_accum=2,
              PSLD_GN_BF16=1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_r5_perf.py [phase ...]
Rows -> scripts/results_r5_perf.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_r5_perf.jsonl")
V5E_PEAK = 197e12
# XLA cost model per-forward TFLOPs (results_res_scaling.jsonl; linear in
# batch — verified at bs1/bs2 for celebahq256 and bs64/128 for cifar10)
HQ256_TFLOPS_PER_IMG = 0.5302
CIFAR_FWD_TFLOPS_PER_IMG = 4.653 / 64
# XLA cost model, flagship train step @ bs128 (PARITY round-2 item 9)
STEP_TFLOPS_BS128 = 27.95


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def fetch_timed(fn, *args, n=1):
    """(first_call_s, steady_s): time by host value fetch (tunneled
    block_until_ready is unreliable, CLAUDE.md)."""
    import numpy as np

    t0 = time.time()
    out = np.asarray(fn(*args))
    first = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn(*args))
    return first, (time.time() - t0) / n, out


def op_time(fn, x, *rest, iters=16):
    """Per-iteration device time of ``fn(x, *rest)``: ``iters``
    applications chained through a data dependency inside ONE jit, one
    f32-scalar fetch at the end. The first measurement pass of this
    script timed each op as its own dispatch — on the tunneled backend
    the RTT + output transfer dominated (a (8,256,256,128) bf16 fetch is
    ~17 MB; the all-op 'floor' row read 24 ms for a tiny add), making
    every row tunnel-bandwidth, not op time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *rest):
        def body(i, acc):
            # acc*1e-30 keeps a loop-carried dependency; 1e-30 is
            # representable in bf16 (same exponent range as f32), so the
            # multiply cannot be constant-folded away
            out = fn(x + acc.astype(x.dtype) * jnp.asarray(1e-30, x.dtype),
                     *rest)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, iters, body,
                                 jnp.asarray(0.0, jnp.float32))

    import numpy as np

    float(run(x, *rest))  # compile + warm
    t0 = time.time()
    float(run(x, *rest))
    el = time.time() - t0
    return el / iters


# --------------------------------------------------------------- hires ---
def _hq256_sampler(bs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.registry import get_module
    from psld_tpu.samplers import make_timesteps
    from psld_tpu.train.loop import build_score_model, build_sde

    cfg = compose(["+dataset=celebahq/celebahq256_psld",
                   "dataset.diffusion.data.root='/tmp'"]).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 256, 256, 6), jnp.float32),
                            jnp.full((1,), 0.5, jnp.float32))
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


def _hq256_cell(bs, nfe, tag, extra_env=None):
    """One timed EM-sampling cell at 256px; returns (sec/step, out)."""
    import jax

    saved = {}
    for k, v in (extra_env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg, sde, factory, params, make_timesteps = _hq256_sampler(bs)
        n_eff = nfe - 1
        ts = make_timesteps(n_eff, 1e-3)
        sample = jax.jit(lambda p, k, z, ts_: factory(p).sample(
            k, z, ts_, n_eff, denoise=True, eps=1e-3))
        z = sde.prior_sampling(jax.random.PRNGKey(1), (bs, 256, 256, 3))
        compile_s, el, out = fetch_timed(
            sample, params, jax.random.PRNGKey(3), z, ts)
        sec_step = el / nfe
        mfu = HQ256_TFLOPS_PER_IMG * bs * 1e12 / sec_step / V5E_PEAK
        emit({"phase": "hires", "cell": tag, "batch": bs, "nfe": nfe,
              "bf16": True, "compile_s": round(compile_s, 1),
              "sec_per_nfe_step": round(sec_step, 5),
              "img_per_s_at_nfe1000": round(bs / (sec_step * 1000), 4),
              "mfu": round(mfu, 4),
              "knobs": dict(extra_env or {})})
        return sec_step, out
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def phase_hires():
    import numpy as np

    # (1) batch curve
    best_bs, best_rate = None, 0.0
    for bs in (1, 2, 4, 8):
        try:
            sec_step, out = _hq256_cell(bs, 100, f"batch_curve_bs{bs}")
            assert np.isfinite(out).all()
            rate = bs / sec_step
            if rate > best_rate:
                best_bs, best_rate = bs, rate
        except Exception as e:
            emit({"phase": "hires", "cell": f"batch_curve_bs{bs}",
                  "error": repr(e)[:300]})
    # (2) knob A/Bs at the best batch
    base_sec, base_out = _hq256_cell(best_bs, 100, "knob_base")
    for tag, env in (("fused_gn", {"PSLD_FUSED_GN": "1"}),
                     ("gn_bf16", {"PSLD_GN_BF16": "1"}),
                     ("fused_gn+gn_bf16",
                      {"PSLD_FUSED_GN": "1", "PSLD_GN_BF16": "1"})):
        try:
            sec, out = _hq256_cell(best_bs, 100, f"knob_{tag}",
                                   extra_env=env)
            import numpy as np

            diff = float(np.abs(out - base_out).mean())
            emit({"phase": "hires", "cell": f"knob_{tag}_delta",
                  "speedup_vs_base": round(base_sec / sec, 4),
                  "mean_abs_out_delta_vs_base": round(diff, 5)})
        except Exception as e:
            emit({"phase": "hires", "cell": f"knob_{tag}",
                  "error": repr(e)[:300]})
    # (3) micro-op roofline at the 256-level shapes
    phase_hires_microops(best_bs)


def phase_hires_microops(bs):
    """Single-op rooflines at the celebahq256 top-pyramid shapes: who eats
    the time? Ops timed via op_time (iterations chained in one jit,
    scalar fetch) so tunnel RTT/transfer cannot dominate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.ops.group_norm import group_norm_act_reference
    from psld_tpu.ops.upfirdn import conv_downsample_2d, upsample_conv_2d

    rng = np.random.default_rng(0)
    t_of = op_time

    rows = []
    for (h, c) in ((256, 128), (128, 128), (128, 256), (64, 256)):
        x = jnp.asarray(rng.standard_normal((bs, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02,
                        jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        # conv3x3 same-res (the resblock workhorse)
        el = t_of(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)
        flops = 2 * bs * h * h * c * c * 9
        byts = (2 * bs * h * h * c + c * c * 9) * 2
        rows.append({"op": "conv3x3", "h": h, "c": c, "sec": el,
                     "tflops_s": flops / el / 1e12,
                     "gb_s": byts / el / 1e9})
        # GroupNorm + swish (the jnp chain)
        el = t_of(lambda x, s, b: group_norm_act_reference(
            x, s, b, min(c // 4, 32), 1e-6, "swish"), x, scale, bias)
        byts = (2 * bs * h * h * c) * 2  # read + write bf16
        rows.append({"op": "gn_swish", "h": h, "c": c, "sec": el,
                     "tflops_s": 0.0, "gb_s": byts / el / 1e9})
        # FIR down / up (conv + upfirdn chains)
        el = t_of(lambda x, w: conv_downsample_2d(x, w, k=[1, 3, 3, 1]),
                  x, w)
        flops = 2 * bs * (h // 2) * (h // 2) * c * c * 9
        rows.append({"op": "fir_down_conv", "h": h, "c": c, "sec": el,
                     "tflops_s": flops / el / 1e12})
        el = t_of(lambda x, w: upsample_conv_2d(x, w, k=[1, 3, 3, 1]),
                  x, w)
        flops = 2 * bs * (2 * h) * (2 * h) * c * c * 9 / 4  # lhs-dilated
        rows.append({"op": "fir_up_conv", "h": h, "c": c, "sec": el,
                     "tflops_s": flops / el / 1e12})
    # per-iteration floor of the chained-loop harness itself
    el = t_of(lambda x: x + 1.0, jnp.zeros((8, 8), jnp.float32))
    rows.append({"op": "tiny_add_loop_floor", "sec": el})
    for r in rows:
        r = dict(r)
        r["sec"] = round(r["sec"], 5)
        for k in ("tflops_s", "gb_s"):
            if k in r:
                r[k] = round(r[k], 2)
        emit(dict({"phase": "hires_microops", "batch": bs}, **r))


# ------------------------------------------------------------ adaptive ---
def phase_adaptive():
    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo/scripts")
    from tpu_r4_measure import _build_sampler

    from psld_tpu.config import ConfigDict
    from psld_tpu.samplers.ode import AdaptiveODESampler, RKODESampler

    bs = 64
    cfg, sde, factory, params, make_timesteps = _build_sampler(bs)

    # use the trained round-5 flagship EMA params when present: adaptive
    # NFE/quality is only meaningful on a real score field (random
    # weights blow the PF-ODE up to |x| ~ 1e4); mirrors the reference's
    # protocol of evaluating the trained ckpt under (nu,gamma)=(4.02,0.02)
    out_dir = os.environ.get("PSLD_R5_DIR", "/tmp/psld_r5")
    import glob as _glob

    ckpts = sorted(
        c for c in _glob.glob(f"{out_dir}/flagship/checkpoints/*epoch=*")
        if not c.endswith(".meta.json"))
    trained = bool(ckpts)
    if trained:
        from psld_tpu.train import checkpoint as ckpt_mod
        from psld_tpu.train.state import init_state, make_optimizer

        opt = make_optimizer(cfg.training.optimizer)
        state = ckpt_mod.restore_checkpoint(ckpts[-1],
                                            init_state(params, opt))
        params = state.ema_params
    emit({"phase": "adaptive", "cell": "params_source",
          "trained_checkpoint": ckpts[-1] if trained else None})
    z = sde.prior_sampling(jax.random.PRNGKey(1), (bs, 32, 32, 3))

    # diagnose the host/device f64 ulp mismatch seen on the first run
    import jax.numpy as jnp

    emit({"phase": "adaptive", "cell": "f64_probe",
          "T_type": str(type(sde.T)),
          "host_t_end": repr(float(sde.T) - 1e-3),
          "dev_t_end": repr(float(jnp.asarray(sde.T - 1e-3, jnp.float64))),
          "dev_roundtrip_0p999": repr(float(jnp.asarray(0.999,
                                                        jnp.float64)))})

    def xstats(y):
        x = np.clip((np.asarray(y[..., :3], np.float64) + 1) / 2, 0, 1)
        tv = (np.abs(np.diff(x, axis=1)).mean()
              + np.abs(np.diff(x, axis=2)).mean()) / 2
        return {"mean": round(float(x.mean()), 4),
                "std": round(float(x.std()), 4),
                "tv": round(float(tv), 4),
                "data_ref": {"mean": 0.2987, "std": 0.2094, "tv": 0.015}}

    # hard iteration cap: with a pathological state (h collapse near the
    # singular end) the controller could otherwise spin to the default
    # max_steps=100k, ~5 h of dispatches — 3000 iterations = 18k NFE is
    # far beyond any sane solve and still terminates in ~10 min
    ada_max = int(os.environ.get("PSLD_ADA_MAX_ITERS", 3000))

    def ada_sampler(p, rtol):
        acfg = ConfigDict(cfg.to_dict())
        acfg["evaluation"] = {"sampler": {"name": "adaptive_ode",
                                          "rtol": rtol, "atol": rtol,
                                          "max_steps": ada_max}}
        probe = factory(p)
        return AdaptiveODESampler(acfg, sde, probe.score_fn)

    # PSLD_ADA_RTOLS=1e-3 limits the sweep (each tolerance bakes its own
    # error-norm constants -> one server-side compile per rtol)
    rtols = [float(x) for x in os.environ.get(
        "PSLD_ADA_RTOLS", "1e-2,1e-3,1e-4").split(",")]
    for rtol in rtols:
        max_steps = ada_sampler(params, rtol).max_steps
        # the sampler (with its bf16-cast score_fn) is rebuilt inside each
        # jit so params stay a traced argument, never baked-in constants
        init = jax.jit(lambda p, z, r=rtol: ada_sampler(p, r)
                       .adaptive_init(z, 1e-3))
        run = jax.jit(lambda p, c, r=rtol: ada_sampler(p, r).adaptive_run(
            c, 1e-3, max_iters=40))  # 40 iters = 240 NFE ~ 8 s devices
        fin = jax.jit(lambda p, c, r=rtol: ada_sampler(p, r)
                      .adaptive_finalize(c, denoise=True, eps=1e-3))
        t0 = time.time()
        carry = init(params, z)
        emit({"phase": "adaptive", "cell": f"init_done_rtol{rtol:g}",
              "wall_s": round(time.time() - t0, 1)})
        n_disp = 0
        t_end = float(sde.T) - 1e-3
        prev_steps = -1
        while True:
            carry = run(params, carry)
            n_disp += 1
            t_now, steps_now = float(carry[2]), int(carry[5])
            if n_disp % 5 == 0 or n_disp == 1:
                emit({"phase": "adaptive", "cell": "progress",
                      "rtol": rtol, "dispatch": n_disp,
                      "t_raw": repr(t_now), "h": float(carry[3]),
                      "steps": steps_now,
                      "wall_s": round(time.time() - t0, 1)})
            # zero-progress dispatch = device cond false = solve done
            # (authoritative; the host-side f64 compare can disagree by an
            # ulp on this backend and spin forever — hit at dispatch 2 of
            # the first on-chip run)
            if steps_now == prev_steps:
                break
            prev_steps = steps_now
            if not (t_now < t_end and steps_now < max_steps):
                break
        y, nfe = fin(params, carry)
        y = np.asarray(y)
        el = time.time() - t0
        nfe = int(nfe)
        assert np.isfinite(y).all()
        emit({"phase": "adaptive", "cell": f"adaptive_rtol{rtol:g}",
              "batch": bs, "bf16": True, "rtol": rtol, "nfe": nfe,
              "dispatches": n_disp, "wall_s": round(el, 2),
              "img_per_s": round(bs / el, 4),
              "mfu": round(CIFAR_FWD_TFLOPS_PER_IMG * bs * nfe * 1e12
                           / el / V5E_PEAK, 4),
              "trained": trained,
              "out_std": round(float(y.std()), 4),
              "xstats": xstats(y)})

        # rk_ode (heun) at matched NFE: the fixed-grid on-device rival
        n_steps = max(2, nfe // 2)
        rcfg = ConfigDict(cfg.to_dict())
        rcfg["evaluation"] = {"sampler": {"name": "rk_ode",
                                          "solver": "heun"}}
        ts = make_timesteps(n_steps, 1e-3)
        rfn = jax.jit(lambda p, z, ts_: RKODESampler(
            rcfg, sde, factory(p).score_fn).sample(None, z, ts_, n_steps))
        _, el_rk, out_rk = fetch_timed(rfn, params, z, ts)
        emit({"phase": "adaptive", "cell": f"rk_heun_match_rtol{rtol:g}",
              "batch": bs, "nfe": 2 * n_steps, "wall_s": round(el_rk, 2),
              "img_per_s": round(bs / el_rk, 4),
              "mfu": round(CIFAR_FWD_TFLOPS_PER_IMG * bs * 2 * n_steps
                           * 1e12 / el_rk / V5E_PEAK, 4),
              "mean_abs_delta_vs_adaptive": round(
                  float(np.abs(out_rk - y).mean()), 5)})

    # bb_ode: the SciPy host loop (reference parity path) at rtol=1e-3;
    # one batch is enough to land the comparison row
    from psld_tpu.samplers.ode import BBODESampler

    bcfg = ConfigDict(cfg.to_dict())
    bcfg["evaluation"] = {"sampler": {"name": "bb_ode", "rtol": 1e-3,
                                      "atol": 1e-3, "solver": "RK45"}}
    bb = BBODESampler(bcfg, sde, factory(params).score_fn)
    t0 = time.time()
    out_bb = np.asarray(bb.sample(None, z, None, None))
    el_bb = time.time() - t0
    emit({"phase": "adaptive", "cell": "bb_ode_rtol0.001", "batch": bs,
          "nfe": int(bb.nfe), "wall_s": round(el_bb, 2),
          "img_per_s": round(bs / el_bb, 4),
          "finite": bool(np.isfinite(out_bb).all())})


# ----------------------------------------------------------- trainattr ---
def phase_trainattr_micro():
    """Micro-op attribution of the flagship train-step backward gap:
    fwd / grad-input / grad-filter convs + GN fwd/bwd at the flagship's
    level shapes (bs128 bf16), achieved TFLOP/s per class."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    bs = 128
    t_of = op_time

    # per-class conv micro-bench at the flagship level shapes (32px,
    # ch_mult [2,2,2] -> c=256 at 32/16/8 after nf=128 doubling)
    for (h, cin, cout) in ((32, 256, 256), (16, 256, 256), (8, 256, 256),
                           (32, 6, 128)):
        x = jnp.asarray(rng.standard_normal((bs, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                        jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        flops = 2 * bs * h * h * cin * cout * 9
        el_f = t_of(conv, x, w)
        # grad wrt input (dgrad) and filter (wgrad), isolated via vjp
        cot = jnp.asarray(rng.standard_normal((bs, h, h, cout)),
                          jnp.bfloat16)
        el_dx = t_of(lambda x, w, c: jax.vjp(lambda xx: conv(xx, w), x)[1](c)[0],
                     x, w, cot)
        el_dw = t_of(lambda x, w, c: jax.vjp(lambda ww: conv(x, ww), w)[1](c)[0],
                     x, w, cot)
        for tag, el in (("fwd", el_f), ("dgrad", el_dx), ("wgrad", el_dw)):
            emit({"phase": "trainattr", "op": f"conv3x3_{tag}", "h": h,
                  "cin": cin, "cout": cout, "batch": bs,
                  "sec": round(el, 5),
                  "tflops_s": round(flops / el / 1e12, 2),
                  "mfu": round(flops / el / V5E_PEAK, 4)})

    # GN fwd/bwd at the flagship shape
    from psld_tpu.ops.group_norm import group_norm_act_reference

    for (h, c) in ((32, 256), (16, 256)):
        x = jnp.asarray(rng.standard_normal((bs, h, h, c)), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        gn = lambda x, s, b: group_norm_act_reference(x, s, b,
                                                      min(c // 4, 32),
                                                      1e-6, "swish")
        el_f = t_of(gn, x, scale, bias)
        cot = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
        el_b = t_of(lambda x, s, b, c_: jax.vjp(
            lambda xx: gn(xx, s, b), x)[1](c_)[0], x, scale, bias, cot)
        byts = 2 * bs * h * h * c * 2
        for tag, el in (("fwd", el_f), ("bwd", el_b)):
            emit({"phase": "trainattr", "op": f"gn_swish_{tag}", "h": h,
                  "c": c, "batch": bs, "sec": round(el, 5),
                  "gb_s": round(byts / el / 1e9, 1)})

def phase_trainattr():
    """Whole-step counter-levers + the micro attribution table."""
    import jax
    import jax.numpy as jnp

    bs = 128
    phase_trainattr_micro()
    # whole-step counter-levers (vs the round-4 hw_inline 581 img/s row)
    sys.path.insert(0, "/root/repo/scripts")
    from tpu_r4_measure import build_step

    cells = [
        # (name, extras, batch shape fed to the step)
        ("base_hw_inline",
         ["+dataset.diffusion.model.score_fn.dropout_impl=hw_inline"],
         (bs, 32, 32, 3)),
        # grad_accum=A wants [A, B, ...] stacked microbatches: same
        # effective batch 128, backward tiled at bs64 — probes whether
        # the backward convs tile better at the smaller M
        ("lever_grad_accum2",
         ["+dataset.diffusion.model.score_fn.dropout_impl=hw_inline",
          "+dataset.diffusion.training.grad_accum=2"],
         (2, bs // 2, 32, 32, 3)),
        ("lever_gn_bf16",
         ["+dataset.diffusion.model.score_fn.dropout_impl=hw_inline",
          "+dataset.diffusion.model.score_fn.gn_bf16=true"],
         (bs, 32, 32, 3)),
    ]
    for name, extra, bshape in cells:
        try:
            step_fn, state = build_step(extra, bs)
            batch = jax.random.normal(jax.random.PRNGKey(1), bshape,
                                      jnp.float32)
            t0 = time.time()
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
            float(metrics["loss"])
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(10):
                state, metrics = step_fn(state, batch,
                                         jax.random.PRNGKey(3 + i))
            float(metrics["loss"])
            el = (time.time() - t0) / 10
            emit({"phase": "trainattr", "cell": name, "batch": bs,
                  "bf16": True, "compile_s": round(compile_s, 1),
                  "sec_per_step": round(el, 4),
                  "img_per_s": round(bs / el, 1),
                  "mfu": round(STEP_TFLOPS_BS128 * 1e12 / el / V5E_PEAK,
                               4)})
        except Exception as e:
            emit({"phase": "trainattr", "cell": name,
                  "error": repr(e)[:300]})


def phase_gnbf16_gate():
    """Quality gates for the gn_bf16 lever (+7.6% train, +8.5% 256px
    sampling): (a) demo-scale train convergence A/B — loss traces with
    the knob on must track the stock f32-chain run; (b) flagship EM-1000
    sampling with the knob on — pixel stats + SWD vs data_ref must match
    the matrix base cell. Mirrors the dropout-impl gating protocol
    (scripts/tpu_dropout_convergence.py)."""
    import glob

    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    out = os.environ.get("PSLD_R5_DIR", "/tmp/psld_r5")
    steps = int(os.environ.get("PSLD_GNGATE_STEPS", 3000))
    base = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={out}",
        "dataset.diffusion.model.score_fn.nf=64",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.fir=True",
        "+dataset.diffusion.model.score_fn.dropout_impl=hw_inline",
        "+dataset.diffusion.training.bf16=True",
        "dataset.diffusion.training.batch_size=128",
        "dataset.diffusion.training.epochs=1000000",
        "dataset.diffusion.training.chkpt_interval=1000000",
        "dataset.diffusion.training.ema_decay=0.999",
        "+dataset.diffusion.training.steps_per_dispatch=8",
    ]
    traces = {}
    for arm, extra in (("f32_gn", []),
                       ("gn_bf16",
                        ["+dataset.diffusion.model.score_fn.gn_bf16=true"])):
        res = f"{out}/gngate_{arm}"
        cfg = compose(base + [
            f"dataset.diffusion.training.results_dir={res}"]
            + extra).dataset.diffusion
        t0 = time.time()
        train_sde(cfg, max_steps=steps)
        losses = []
        import json as _json

        for line in open(f"{res}/metrics.jsonl"):
            r = _json.loads(line)
            if "loss" in r and "step" in r:
                losses.append((r["step"], r["loss"]))
        traces[arm] = losses
        tail = [l for _, l in losses[-10:]]
        emit({"phase": "gnbf16_gate", "cell": f"train_{arm}",
              "steps": steps, "wall_s": round(time.time() - t0, 1),
              "loss_tail_mean": round(float(np.mean(tail)), 5)})
    # trace comparison at matched steps
    a = dict(traces["f32_gn"])
    b = dict(traces["gn_bf16"])
    common = sorted(set(a) & set(b))[-20:]
    rel = [abs(a[s] - b[s]) / max(1e-9, abs(a[s])) for s in common]
    emit({"phase": "gnbf16_gate", "cell": "trace_delta",
          "n_points": len(common),
          "mean_rel_delta_last20": round(float(np.mean(rel)), 4),
          "max_rel_delta_last20": round(float(np.max(rel)), 4)})

    # (b) flagship sampling quality with the knob on
    ckpts = sorted(
        c for c in glob.glob(f"{out}/flagship/checkpoints/*epoch=*")
        if not c.endswith(".meta.json"))
    if ckpts:
        os.environ["PSLD_GN_BF16"] = "1"
        try:
            from psld_tpu.eval.generate import sample
            from psld_tpu.eval.pixel_stats import compare_dirs
            from psld_tpu.eval.swd import swd_dirs

            scfg = compose([
                "+dataset=cifar10/cifar10_psld",
                "dataset.diffusion.data.name=synthetic",
                f"dataset.diffusion.data.root={out}",
                "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
                "dataset.diffusion.model.score_fn.num_res_blocks=8",
                "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
                "dataset.diffusion.model.score_fn.dropout=0.15",
                "dataset.diffusion.model.score_fn.progressive_input="
                "'residual'",
                "dataset.diffusion.model.score_fn.fir=True",
                "dataset.diffusion.model.score_fn.embedding_type='fourier'",
                f"dataset.diffusion.evaluation.chkpt_path={ckpts[-1]}",
                "dataset.diffusion.evaluation.sample_from=target",
                "+dataset.diffusion.evaluation.bf16=true",
                "dataset.diffusion.evaluation.batch_size=64",
                "dataset.diffusion.evaluation.n_samples=1024",
                "dataset.diffusion.evaluation.n_discrete_steps=1000",
                "+dataset.diffusion.evaluation.nfe_per_dispatch=250",
                f"dataset.diffusion.evaluation.save_path={out}/gngate_sample",
            ]).dataset.diffusion
            t0 = time.time()
            n = sample(scfg)
            stats = compare_dirs(f"{out}/gngate_sample/images",
                                 f"{out}/data_ref")
            swd = swd_dirs(f"{out}/gngate_sample/images",
                           f"{out}/data_ref")
            emit({"phase": "gnbf16_gate", "cell": "flagship_em1000",
                  "n": int(n), "wall_s": round(time.time() - t0, 1),
                  "delta": stats.get("delta", stats), "swd": swd,
                  "matrix_base_swd_avg": 22.1,
                  "matrix_base_tv_delta": 0.0003})
        finally:
            os.environ.pop("PSLD_GN_BF16", None)


# --------------------------------------------------------- hires_train ---
def _hq256_train_cell(bs, tag, extra=(), extra_env=None, n_iters=8):
    """One timed celebahq256 TRAIN-step cell (bf16, donated buffers).

    MFU denominator: 3 x per-forward XLA-cost-model FLOPs x batch (fwd +
    backward, no remat-recompute credit) — the same accounting as
    STEP_TFLOPS_BS128 (= 3 x CIFAR_FWD_TFLOPS_PER_IMG x 128); client-side
    cost_analysis returns None on the axon backend (DESIGN.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    saved = {}
    for k, v in (extra_env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg = compose(["+dataset=celebahq/celebahq256_psld",
                       "dataset.diffusion.data.root='/tmp'",
                       "+dataset.diffusion.training.bf16=True",
                       "+dataset.diffusion.training.remat=true",
                       f"dataset.diffusion.training.batch_size={bs}",
                       ] + list(extra)).dataset.diffusion
        sde = build_sde(cfg)
        net = build_score_model(cfg)
        criterion = PSLDScoreLoss(cfg, sde)
        shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 256, 256, 6), jnp.float32),
                                jnp.full((1,), 0.5, jnp.float32))
        rng = np.random.default_rng(0)
        params = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape).astype(s.dtype) * 0.02),
            shapes)
        step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                             donate=True)
        state = init_state(params, optimizer)
        batch = jax.random.normal(jax.random.PRNGKey(1), (bs, 256, 256, 3),
                                  jnp.float32)
        step_tflops = 3.0 * HQ256_TFLOPS_PER_IMG * bs
        t0 = time.time()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        loss0 = float(metrics["loss"])
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(n_iters):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(3 + i))
        loss = float(metrics["loss"])
        el = (time.time() - t0) / n_iters
        assert loss == loss and loss0 == loss0, f"nan loss in {tag}"
        emit({"phase": "hires_train", "cell": tag, "batch": bs,
              "bf16": True, "remat": "remat=false" not in " ".join(extra),
              "knobs": dict(extra_env or {}), "extra": list(extra),
              "compile_s": round(compile_s, 1),
              "step_tflops_3xfwd": round(step_tflops, 3),
              "sec_per_step": round(el, 4),
              "img_per_s": round(bs / el, 2),
              "mfu": round(step_tflops * 1e12 / el / V5E_PEAK, 4)})
        return el
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def phase_hires_train():
    """256px TRAIN batch curve + knob A/Bs (round-4 point: bs2+remat
    17.4 img/s; the sampling side showed bs2 sits in an XLA tiling
    valley — does the train step too?)."""
    only = os.environ.get("PSLD_HQTRAIN_CELLS")
    curve = [int(b) for b in
             os.environ.get("PSLD_HQTRAIN_BS", "2,8").split(",")]
    best_bs, best = None, None
    for bs in curve:
        name = f"batch_curve_bs{bs}"
        if only and name not in only.split(","):
            continue
        try:
            el = _hq256_train_cell(bs, name)
            if best is None or bs / el > best:
                best_bs, best = bs, bs / el
        except Exception as e:
            emit({"phase": "hires_train", "cell": name,
                  "error": repr(e)[:300]})
    if best_bs is None:
        best_bs = 8
    for tag, extra, env in (
            ("gn_bf16",
             ["+dataset.diffusion.model.score_fn.gn_bf16=true"], None),
            ("no_remat", ["dataset.diffusion.training.remat=false"], None)):
        name = f"knob_{tag}_bs{best_bs}"
        if only and name not in only.split(","):
            continue
        try:
            _hq256_train_cell(best_bs, name, extra=extra, extra_env=env)
        except Exception as e:
            emit({"phase": "hires_train", "cell": name,
                  "error": repr(e)[:300]})


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    phases = sys.argv[1:] or ["hires", "adaptive", "trainattr"]
    for ph in phases:
        {"hires": phase_hires, "adaptive": phase_adaptive,
         "trainattr": phase_trainattr, "hires_train": phase_hires_train,
         "micro": lambda: (phase_hires_microops(8),
                           phase_trainattr_micro()),
         "gnbf16_gate": phase_gnbf16_gate,
         }[ph]()
    emit({"phase": "r5_perf_done", "phases": phases})


if __name__ == "__main__":
    main()
