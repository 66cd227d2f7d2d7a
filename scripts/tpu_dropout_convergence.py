"""Convergence check for the Pallas hardware-PRNG dropout (ops/dropout.py).

The kernel's masks are statistically equivalent to nn.Dropout's but not
bit-identical (hardware PRNG vs threefry), so a lockstep drift test
cannot apply. Instead: train the learning-demo recipe (nf=64, synthetic
data, bs128 — the round-2/3 convergence workhorse) for N steps twice
from the SAME init, once per dropout impl, and compare the loss traces.
Equivalent regularization ==> traces that match within seed noise.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_dropout_convergence.py [steps]
Rows append to scripts/results_mfu_r3.jsonl (phase dropout_convergence).
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results_mfu_r3.jsonl")

DEMO = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.root='/tmp'",
    "dataset.diffusion.data.name=synthetic",
    "dataset.diffusion.model.score_fn.nf=64",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=2",
    "dataset.diffusion.model.score_fn.dropout=0.15",
    "+dataset.diffusion.training.bf16=True",
]


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def run_arm(impl: str, steps: int):
    os.environ.pop("PSLD_DROPOUT_PALLAS", None)
    if impl == "pallas":
        os.environ["PSLD_DROPOUT_PALLAS"] = "1"

    import jax
    import jax.numpy as jnp

    from psld_tpu.config import compose
    from psld_tpu.data.datasets import build_dataset
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.train.loop import build_score_model, build_sde
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    cfg = compose(DEMO).dataset.diffusion
    sde = build_sde(cfg)
    net = build_score_model(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    x0 = jnp.zeros((1, 32, 32, 6), jnp.float32)
    t0 = jnp.full((1,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, t0)  # same init per arm
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg)
    state = init_state(params, optimizer)

    ds = build_dataset(cfg)
    batch = jnp.stack([jnp.asarray(ds[i][0]) for i in range(128)])

    trace = {}
    t_start = time.time()
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
        if i == 0:
            float(metrics["loss"])
            compile_s = time.time() - t_start
            t_start = time.time()
        if (i + 1) % 100 == 0:
            trace[i + 1] = round(float(metrics["loss"]), 5)
    wall = time.time() - t_start
    emit({"phase": "dropout_convergence", "dropout_impl": impl,
          "steps": steps, "batch": 128, "bf16": True, "dropout": 0.15,
          "compile_s": round(compile_s, 1), "train_wall_s": round(wall, 1),
          "loss_trace": trace})
    return trace


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.import_modules_into_registry()

    stock = run_arm("save_mask", steps)
    pallas = run_arm("pallas", steps)
    tail_keys = sorted(stock)[-3:]
    rel = max(abs(stock[k] - pallas[k]) / max(abs(stock[k]), 1e-6)
              for k in tail_keys)
    emit({"phase": "dropout_convergence", "cell": "verdict",
          "tail_rel_diff": round(rel, 4),
          "note": "max relative loss gap over the last 3 trace points"})


if __name__ == "__main__":
    main()
