"""Resolution-scaling benchmark: EM-sampling throughput per chip for the
reference's three resolutions (CIFAR-10 32, CelebA-64, AFHQv2-128), each
at its SOTA-recipe model config, with MFU from the XLA cost model.

Complements the driver bench (bench.py, CIFAR-10 only): the reference
trains/samples all three families (scripts_psld/sota + ablations), so the
perf record should show how the TPU operating point scales with image
size, not just the 32x32 flagship.

Timing per (config, batch): one compiled EM sampler program (single
lax.scan), timed by host value fetch after a warmup dispatch. FLOPs via
jit-lowering cost analysis, falling back to a CPU-jax subprocess on
backends that hide client-side cost analysis (axon).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/tpu_res_scaling.py [nfe]
Cost-only subprocess mode (internal): PSLD_RS_COST_ONLY=<case> prints the
per-forward flops for that case and exits.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = {
    # name -> (hydra config, image_size, batch sizes)
    "cifar10_32": ("cifar10/cifar10_psld", 32, (64,)),
    "celeba_64": ("celeba64/celeba64_psld", 64, (16, 32)),
    "afhqv2_128": ("afhqv2/afhqv2128_psld", 128, (4, 8)),
    # extension config (PARITY: session-2 addition), one resolution up
    "celebahq_256": ("celebahq/celebahq256_psld", 256, (1, 2)),
}
SOTA = {
    # the SOTA recipe overrides from scripts/sota/uncond/*/train_*.sh
    "cifar10_32": [
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
    ],
    "celeba_64": [
        "dataset.diffusion.model.score_fn.ch_mult=[1,2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=4",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
    ],
    # AFHQv2-128 has no sota recipe in the reference; the YAML defaults
    # (ch_mult=[1,2,2,2,3], 2 resblocks) are its operating point
    "afhqv2_128": [],
    # the celebahq256 YAML already encodes the standard NCSN++ 256 recipe
    "celebahq_256": [],
}


def build(case):
    from psld_tpu.config import compose
    from psld_tpu.train.loop import build_score_model, build_sde

    cfg_name, size, _ = CASES[case]
    overrides = [f"+dataset={cfg_name}", "dataset.diffusion.data.root='/tmp'"]
    overrides += SOTA[case]
    cfg = compose(overrides).dataset.diffusion
    return cfg, build_sde(cfg), build_score_model(cfg), size


def fwd_flops_for(case, batch):
    """XLA cost model of one forward; None if unavailable client-side."""
    import jax
    import jax.numpy as jnp

    cfg, sde, net, size = build(case)
    x0 = jnp.zeros((batch, size, size, 6), jnp.float32)
    t0 = jnp.full((batch,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    fwd = jax.jit(lambda p, x, t: net.apply(p, x, t))
    try:
        cost = fwd.lower(
            shapes, jax.ShapeDtypeStruct((batch, size, size, 6),
                                         jnp.float32), t0).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]) if cost is not None else None
    except Exception:
        return None


def cost_via_cpu(case, batch):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               PSLD_RS_COST_ONLY=f"{case}:{batch}")
    try:
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, timeout=900)
        return float(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main():
    only = os.environ.get("PSLD_RS_COST_ONLY")
    if only:
        case, batch = only.split(":")
        import psld_tpu

        psld_tpu.enable_x64()
        psld_tpu.import_modules_into_registry()
        print(fwd_flops_for(case, int(batch)))
        return

    nfe = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.registry import get_module
    from psld_tpu.samplers import make_timesteps

    v5e_peak = 197e12
    selected = [c for c in os.environ.get("PSLD_RS_CASES", "").split(",")
                if c]
    unknown = [c for c in selected if c not in CASES]
    if unknown:
        raise SystemExit(f"unknown PSLD_RS_CASES {unknown}; "
                         f"valid: {sorted(CASES)}")
    # PSLD_RS_BATCHES=2,4 restricts the per-case batch list (re-runs of a
    # single missing row shouldn't pay every row's compile again)
    bs_filter = [int(b) for b in
                 os.environ.get("PSLD_RS_BATCHES", "").split(",") if b]
    for case in (selected or CASES):
        cfg, sde, net, size = build(case)
        n_params = None
        for batch in (bs_filter or CASES[case][2]):
            x0 = jnp.zeros((batch, size, size, 6), jnp.float32)
            t0 = jnp.full((batch,), 0.5, jnp.float32)
            shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
            if n_params is None:
                n_params = sum(int(np.prod(s.shape))
                               for s in jax.tree_util.tree_leaves(shapes))
            rng = np.random.default_rng(0)
            params = jax.tree_util.tree_map(
                lambda s: jnp.asarray(
                    rng.standard_normal(s.shape).astype(s.dtype) * 0.02),
                shapes)
            flops = fwd_flops_for(case, batch) or cost_via_cpu(case, batch)

            sampler_cls = get_module("samplers", "em_sde")
            n_eff = nfe - 1
            ts = make_timesteps(n_eff, 1e-3)

            # PSLD_RS_BF16=1: bf16 network (params + activations), f32
            # SDE math — same contract as evaluation.bf16
            bf16 = os.environ.get("PSLD_RS_BF16", "0") == "1"

            def run(params, k, z):
                if bf16:
                    p16 = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, params)
                    score = lambda zz, tt: net.apply(
                        p16, zz.astype(jnp.bfloat16), tt
                    ).astype(jnp.float32)
                else:
                    score = lambda zz, tt: net.apply(params, zz, tt)
                s = sampler_cls(cfg, sde, score)
                return s.sample(k, z, ts, n_eff, denoise=True, eps=1e-3)

            sample = jax.jit(run)
            z = sde.prior_sampling(jax.random.PRNGKey(1),
                                   (batch, size, size, 3))
            t_c = time.time()
            np.asarray(sample(params, jax.random.PRNGKey(2), z))
            compile_s = time.time() - t_c
            t0_ = time.time()
            np.asarray(sample(params, jax.random.PRNGKey(3), z))
            el = time.time() - t0_
            rec = {
                "case": case, "image_size": size, "batch": batch,
                "bf16": bf16,
                "nfe": nfe, "params_m": round(n_params / 1e6, 1),
                "img_per_s": round(batch / el, 4),
                "sec_per_nfe_step": round(el / nfe, 5),
                "compile_s": round(compile_s, 1),
            }
            if flops:
                rec["model_tflops_per_fwd"] = round(flops / 1e12, 4)
                rec["mfu_vs_v5e_bf16_peak"] = round(
                    flops * nfe / el / v5e_peak, 4)
            print(json.dumps(rec), flush=True)
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "results_res_scaling.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
