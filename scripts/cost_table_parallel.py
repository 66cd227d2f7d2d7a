"""When do FSDP / spatial pay? A compile-time cost table (VERDICT #6).

Round-2 proved {DP, FSDP, DP x spatial} trajectory-correct on the virtual
mesh; this script quantifies their COST so a user can pick a config:

  - bytes moved per step per device, by collective kind (all-gather /
    reduce-scatter / all-reduce / collective-permute a.k.a. halo
    exchange), parsed from the SPMD-partitioned optimized HLO of the
    full jitted train step;
  - per-device memory from XLA's compile-time analysis (temp + argument
    bytes — the same method as the round-2 remat study);
  - relative step wall-clock on the virtual 8-device CPU mesh at a
    reduced model size (1-host-core execution of the production sizes is
    not meaningful; the reduced rows show the relative overhead trend,
    the bytes/HBM rows are at PRODUCTION size).

Cases: cifar10-SOTA (97.6M, 32px) at global bs128, and celebahq256 (66M,
256px) at per-chip bs1 — the regime DDP cannot express
(/root/reference/main/train_sde.py:114 replicates the model per process;
one 256px sample's activations must fit one chip there).

Regimes on 8 virtual devices: dp (8-way batch), fsdp (8-way batch +
8-way param shard), dp4_sp2 (4-way batch x 2-way height shard).

One JSON line per row -> scripts/results_cost_table.jsonl.
Usage: python scripts/cost_table_parallel.py [--exec-only|--compile-only]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

N_DEV = 8

# the axon sitecustomize (PYTHONPATH) imports jax before this module runs,
# fixing the backend to 1 device — re-exec once with a clean interpreter so
# the virtual 8-device CPU platform takes effect
if os.environ.get("PSLD_COST_CHILD") != "1":
    env = dict(os.environ, PSLD_COST_CHILD="1", PYTHONPATH="/root/repo",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + f" --xla_force_host_platform_device_count={N_DEV}"))
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__),
                               *sys.argv[1:]], env)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_cost_table.jsonl")

# production shapes (compile-time analysis rows)
CASES = {
    "cifar10_sota_bs128": {
        "overrides": [
            "+dataset=cifar10/cifar10_psld",
            "dataset.diffusion.data.root='/tmp'",
            "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=8",
            "dataset.diffusion.model.score_fn.dropout=0.15",
            "dataset.diffusion.model.score_fn.progressive_input='residual'",
            "dataset.diffusion.model.score_fn.fir=True",
            "dataset.diffusion.model.score_fn.embedding_type='fourier'",
        ],
        "global_bs": 128,
    },
    "celebahq256_bs1": {
        "overrides": [
            "+dataset=celebahq/celebahq256_psld",
            "dataset.diffusion.data.root='/tmp'",
            "+dataset.diffusion.training.remat=True",
        ],
        "global_bs": 8,   # 1 per chip under dp; 1 per 2-chip group under sp
    },
}
# reduced shapes (execution-timing rows; same topology, small model)
EXEC_CASES = {
    "cifar10_small_bs32": {
        "overrides": [
            "+dataset=cifar10/cifar10_psld",
            "dataset.diffusion.data.root='/tmp'",
            "dataset.diffusion.model.score_fn.nf=32",
            "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=2",
        ],
        "global_bs": 32,
    },
    "hires64_small_bs8": {
        "overrides": [
            "+dataset=celebahq/celebahq256_psld",
            "dataset.diffusion.data.root='/tmp'",
            "dataset.diffusion.data.image_size=64",
            "dataset.diffusion.model.score_fn.nf=32",
            "dataset.diffusion.model.score_fn.ch_mult=[1,1,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=2",
            "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        ],
        "global_bs": 8,
    },
}

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
                "s16": 2, "u16": 2, "c64": 8, "c128": 16}
_COLL = ("all-gather", "reduce-scatter", "all-reduce", "collective-permute",
         "all-to-all")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(segment: str) -> int:
    """Sum the byte sizes of every 'dtype[dims]' shape in ``segment``."""
    total = 0
    for m in _SHAPE_RE.finditer(segment):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Per-device bytes produced by each collective kind in the optimized
    (post-SPMD-partitioning) HLO: for each '<shapes> <op>(' instruction,
    the OUTPUT shapes between '=' and the op name. async '-done' rows are
    skipped (the size was counted at '-start')."""
    out = {c: 0 for c in _COLL}
    counts = {c: 0 for c in _COLL}
    for line in hlo_text.splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        lhs = s.split("=", 1)[1]
        for c in _COLL:
            m = re.search(rf"\s({c}(?:-start)?)\(", lhs)
            if m and f"{c}-done" not in lhs:
                seg = lhs[: m.start()]
                if m.group(1).endswith("-start"):
                    # async start outputs '(operand_alias, result)': count
                    # only the result (last shape), not the alias
                    shapes = list(_SHAPE_RE.finditer(seg))
                    seg = shapes[-1].group(0) if shapes else seg
                out[c] += _shape_bytes(seg)
                counts[c] += 1
                break
    return {"bytes_per_device": {k: v for k, v in out.items() if v},
            "n_ops": {k: v for k, v in counts.items() if v}}


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def build(case_def, bf16=False):
    from psld_tpu.config import compose
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde

    cfg = compose(case_def["overrides"]).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    return cfg, sde, net, criterion


def make_regime(regime, cfg, sde, net, criterion, global_bs):
    """Returns (step_fn, state, batch) sharded for the regime."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from psld_tpu.parallel.fsdp import shard_tree, tree_shardings
    from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from psld_tpu.parallel.spatial import (make_spatial_mesh,
                                           spatial_batch_sharding)
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    size = int(cfg.data.image_size)
    nch = int(cfg.data.num_channels)
    x0 = jnp.zeros((1, size, size, 2 * nch), jnp.float32)
    t0 = jnp.full((1,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype) * 0.02), shapes)
    raw = jnp.zeros((global_bs, size, size, nch), jnp.float32)
    devices = jax.devices()[:N_DEV]

    if regime == "dp":
        mesh = make_mesh(devices)
        step_fn, opt = make_train_step(net, sde, criterion, cfg,
                                       donate=False)
        state = replicate(init_state(params, opt), mesh)
        batch = shard_batch(raw, mesh)
    elif regime == "fsdp":
        mesh = make_mesh(devices)
        pshard = tree_shardings(params, mesh, axis_name="data", min_size=0)
        step_fn, opt = make_train_step(net, sde, criterion, cfg,
                                       donate=False, param_shardings=pshard)
        state = shard_tree(init_state(params, opt), mesh, axis_name="data",
                           min_size=0)
        batch = shard_batch(raw, mesh)
    elif regime == "dp4_sp2":
        smesh = make_spatial_mesh(2, devices=devices)
        step_fn, opt = make_train_step(net, sde, criterion, cfg,
                                       donate=False)
        state = replicate(init_state(params, opt), smesh)
        batch = jax.device_put(raw, spatial_batch_sharding(smesh))
    else:
        raise ValueError(regime)
    return step_fn, state, batch


def analyze(case, case_def, regimes, execute):
    import jax

    cfg, sde, net, criterion = build(case_def)
    n_params = None
    for regime in regimes:
        t0 = time.time()
        step_fn, state, batch = make_regime(regime, cfg, sde, net,
                                            criterion,
                                            case_def["global_bs"])
        if n_params is None:
            n_params = sum(x.size for x in jax.tree.leaves(state.params))
        lowered = jax.jit(step_fn).lower(state, batch,
                                         jax.random.PRNGKey(2))
        compiled = lowered.compile()
        compile_s = time.time() - t0
        rec = {"phase": "cost", "case": case, "regime": regime,
               "global_bs": case_def["global_bs"],
               "params_m": round(n_params / 1e6, 1),
               "compile_s": round(compile_s, 1)}
        try:
            rec.update(collective_bytes(compiled.as_text()))
        except Exception as e:  # pragma: no cover
            rec["hlo_parse_error"] = str(e)[:200]
        try:
            ma = compiled.memory_analysis()
            if isinstance(ma, (list, tuple)):
                ma = ma[0]
            rec["mem_temp_mb"] = round(ma.temp_size_in_bytes / 2**20, 1)
            rec["mem_args_mb"] = round(ma.argument_size_in_bytes / 2**20, 1)
            rec["mem_out_mb"] = round(ma.output_size_in_bytes / 2**20, 1)
        except Exception:
            rec["mem_analysis"] = "unavailable on this backend"
        if execute:
            import numpy as _np

            state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
            l0 = float(metrics["loss"])
            t0 = time.time()
            for i in range(3):
                state, metrics = step_fn(state, batch,
                                         jax.random.PRNGKey(3 + i))
            float(metrics["loss"])
            rec["sec_per_step_cpu8dev"] = round((time.time() - t0) / 3, 3)
            rec["loss0"] = round(l0, 5)
            assert _np.isfinite(l0)
        emit(rec)


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.import_modules_into_registry()

    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    regimes = ("dp", "fsdp", "dp4_sp2")
    if mode != "--exec-only":
        for case, cd in CASES.items():
            analyze(case, cd, regimes, execute=False)
    if mode != "--compile-only":
        for case, cd in EXEC_CASES.items():
            analyze(case, cd, regimes, execute=True)
    emit({"phase": "cost_table_done"})


if __name__ == "__main__":
    main()
