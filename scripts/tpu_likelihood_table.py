"""Likelihood (bits/dim) on the LEARNED demo model (VERDICT #9).

Round-2 verified the BPD pipeline on exact-score Gaussians only; this runs
``evaluate_nll`` — the same code path as ``psld_tpu.cli.likelihood`` — on
the 16k-step learned checkpoint (scripts/tpu_r3_prepare.py) over a small
solver/estimator grid:

  n_steps in {25, 50, 100} x divergence in {exact, hutchinson p=1, p=4}

For the augmented PSLD state the reported number is the CLD-style
variational upper bound (eval/likelihood.py); the reference stubs this
capability entirely (main/models/sde/psld.py:372-373 ``prior_logp: pass``).

One JSON line per cell -> scripts/results_likelihood_r3.jsonl.
Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_likelihood_table.py
Env: PSLD_R3_DIR (default /tmp/psld_r3), PSLD_NLL_N (samples, default 256),
     PSLD_NLL_BS (default 128).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

R3 = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
N = int(os.environ.get("PSLD_NLL_N", 256))
BS = int(os.environ.get("PSLD_NLL_BS", 128))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_likelihood_r3.jsonl")

DEMO = [
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={R3}",
    "dataset.diffusion.model.score_fn.nf=64",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=2",
    "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
]


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def latest_ckpt(results: str) -> str:
    ckpts = sorted(c for c in glob.glob(f"{results}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {results}"
    return ckpts[-1]


def main():
    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    from psld_tpu.config import compose
    from psld_tpu.eval.likelihood import evaluate_nll

    ckpt = latest_ckpt(os.path.join(R3, "score"))
    # Hutchinson grid first (the table's value); the exact-trace
    # calibration cells LAST and tiny: exact costs O(D)=6144 chunked
    # reverse passes per RHS (likelihood.py::_divergence_exact — the
    # one-shot jacrev form OOMed at 19 GB, and a bs4/rk4/25-step exact
    # program crashed the tunneled TPU worker mid-dispatch: keep any one
    # dispatch under ~1 min of device time). euler/10-step at bs1 pairs
    # exact with same-grid Hutchinson rows so the probe bias is isolated
    # from the solver error.
    cells = [("rk4", n, "hutchinson", p, N, BS)
             for n in (25, 50, 100) for p in (1, 4)]
    cells += [("euler", 10, "hutchinson", 1, 2, 1),
              ("euler", 10, "hutchinson", 16, 2, 1),
              ("euler", 10, "exact", 0, 2, 1)]
    for solver, n_steps, div, probes, n, bs in cells:
        cfg = compose(DEMO + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
            "dataset.diffusion.evaluation.sample_from=target",
            f"dataset.diffusion.evaluation.batch_size={bs}",
            f"dataset.diffusion.evaluation.n_samples={n}",
            f"+dataset.diffusion.evaluation.likelihood.n_steps={n_steps}",
            f"+dataset.diffusion.evaluation.likelihood.solver={solver}",
            f"+dataset.diffusion.evaluation.likelihood.n_probes={max(probes, 1)}",
            "+dataset.diffusion.evaluation.likelihood.exact_div="
            + ("True" if div == "exact" else "False"),
        ]).dataset.diffusion
        t0 = time.time()
        try:
            bpd = evaluate_nll(cfg)
        except Exception as e:  # noqa: BLE001 — record failures as data
            emit({"phase": "likelihood", "n_steps": n_steps,
                  "solver": solver, "divergence": div, "n_probes": probes,
                  "n_samples": n, "error": str(e)[:300],
                  "elapsed_s": round(time.time() - t0, 1)})
            continue
        emit({"phase": "likelihood", "checkpoint": ckpt,
              "n_steps": n_steps, "solver": solver,
              "divergence": div, "n_probes": probes,
              "n_samples": n, "bits_per_dim": round(float(bpd), 4),
              "elapsed_s": round(time.time() - t0, 1)})
    emit({"phase": "likelihood_done"})


if __name__ == "__main__":
    main()
