"""On-chip ei_ode order-3 quality/throughput rows on the sweep-demo model.

Reuses the 16k-step sweep-demo checkpoint + data reference (pass the demo
out_dir) and runs the productized sweep for ei_ode with
evaluation.sampler.order=3 at its documented envelope (NFE >= 30),
appending rows comparable to the order-2 table in
scripts/results_sweep_demo_r2.jsonl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/tpu_ei3_rows.py /tmp/sweep_demo_r2
"""

import glob
import os
import sys


def main():
    demo_dir = sys.argv[1]

    import psld_tpu

    psld_tpu.enable_x64()
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()

    from psld_tpu.config import compose
    from psld_tpu.eval.sweep import run_sweep

    ckpts = sorted(
        c for c in glob.glob(f"{demo_dir}/train/checkpoints/psld-*")
        if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {demo_dir}"
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={demo_dir}",
        "dataset.diffusion.model.score_fn.nf=64",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.evaluation.n_samples=256",
        "dataset.diffusion.evaluation.batch_size=64",
        "dataset.diffusion.evaluation.sample_prefix=tpu",
        "dataset.diffusion.evaluation.sample_from=target",
        f"dataset.diffusion.evaluation.chkpt_path={ckpts[-1]}",
        "+dataset.diffusion.evaluation.sampler.order=3",
    ]).dataset.diffusion
    recs = run_sweep(
        cfg,
        samplers=["ei_ode"],
        nfes=[30, 50, 100],
        strides=["quadratic", "uniform"],
        out_dir=os.path.join(demo_dir, "sweep_ei3"),
        ref_dir=os.path.join(demo_dir, "data_ref"),
        weights=os.environ.get("FID_WEIGHTS"),
    )
    print(f"done: {len(recs)} rows")


if __name__ == "__main__":
    main()
