"""Timed on-chip sampling fan-out demo (round-2 pipeline validation).

Saves a random-weight flagship checkpoint, then runs the production
`eval.generate.sample` fan-out for a NON-divisible n_samples at the full
1000-NFE EM budget and reports wall-clock vs the pure sampler time implied
by the same-session throughput, proving:
- tail batches cause no recompile (full-width dispatch + host slice),
- PNG encoding overlaps device compute (double buffering),
- writer naming/layout at production scale.

Usage: python scripts/tpu_r2_generate_demo.py [n_samples] (default 288)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 288

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model
    from psld_tpu.train.state import init_state, make_optimizer

    smoke = bool(os.environ.get("PSLD_DEMO_SMOKE"))
    work = tempfile.mkdtemp(prefix="psld_gen_demo_")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={work}",
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
        "dataset.diffusion.model.sde.nu=4.02",
        "dataset.diffusion.model.sde.gamma=0.02",
        f"dataset.diffusion.evaluation.n_samples={n_samples}",
        "dataset.diffusion.evaluation.batch_size=64",
        "dataset.diffusion.evaluation.n_discrete_steps=1000",
        f"dataset.diffusion.evaluation.save_path={work}/samples",
    ] + ([
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.evaluation.n_discrete_steps=5",
        "dataset.diffusion.evaluation.batch_size=2",
    ] if smoke else [])).dataset.diffusion

    # random-weight checkpoint (throughput is value-independent)
    net = build_score_model(cfg)
    x0 = jnp.zeros((2, 32, 32, 6), jnp.float32)
    t0 = jnp.full((2,), 0.5, jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x0, t0)
    host = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(host.standard_normal(s.shape)
                              .astype(s.dtype) * 0.02), shapes)
    state = init_state(params, make_optimizer(cfg.training.optimizer))
    path = ckpt.save_checkpoint(f"{work}/checkpoints",
                                "psld-score_xm-epoch=0000-step=0", state)
    cfg.evaluation.chkpt_path = path

    # timestamp every batch write: steady-state throughput = batches after
    # the first (which absorbs the one-time XLA compile)
    from psld_tpu.eval import writers

    stamps = []
    orig_write = writers.SimpleImageWriter.write_batch

    def stamped(self, samples, rank, batch_idx, **kw):
        r = orig_write(self, samples, rank, batch_idx, **kw)
        stamps.append((batch_idx, len(samples), time.time()))
        return r

    writers.SimpleImageWriter.write_batch = stamped

    t0_all = time.time()
    n = sample(cfg)
    wall = time.time() - t0_all

    import glob

    pngs = glob.glob(f"{work}/samples/images/*.png")
    rec = {
        "phase": "generate_demo",
        "n_samples": n,
        "pngs": len(pngs),
        "wall_s": round(wall, 1),
        "img_per_s_incl_compile": round(n / wall, 3),
        "batches": len(stamps),
    }
    if len(stamps) >= 3:
        # Window [write_0, write_last] spans the device COMPUTE of batches
        # 1..last -- each a full dispatch width even when the tail writes
        # fewer. Divide computed images by the window for the device rate
        # (the written-images rate additionally charges the tail's sliced
        # waste, which vanishes for large n: per_step/n).
        dt = stamps[-1][2] - stamps[0][2]
        n_batches = len(stamps) - 1
        per_step = 64
        rec["steady_device_img_per_s"] = round(n_batches * per_step / dt, 3)
        rec["steady_written_img_per_s"] = round(
            sum(c for _, c, _ in stamps[1:]) / dt, 3)
    print(json.dumps(rec))
    print("samples in", work)


if __name__ == "__main__":
    main()
