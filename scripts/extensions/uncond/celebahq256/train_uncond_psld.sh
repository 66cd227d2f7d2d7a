#!/bin/bash
# EXTENSION recipe (no reference counterpart): CelebA-HQ-256 PSLD training
# -- the PSLD paper's high-res experiment, productized with the TPU
# scaling knobs this framework adds. Effective batch = 8 per chip x 8
# chips = 64 on a v5e slice via plain data parallelism: the round-5
# measurements (PARITY round-5 item 2, results_r5_perf.jsonl hires_train
# rows) showed the full 256px backward FITS per-chip HBM up to bs16
# without remat (remat recompute was +25% pure overhead) and runs at
# 60-64% MFU with gn_bf16 -- so remat / spatial sharding / grad_accum
# are NOT needed at this size. They remain available for larger models
# or images:
#   +dataset.diffusion.training.remat=true     per-resblock remat
#   +dataset.diffusion.training.spatial=S      one sample over S chips
#   +dataset.diffusion.training.grad_accum=A   A stacked microbatches
# Set DATA_ROOT / RESULTS_DIR before running.
python -m psld_tpu.cli.train_sde +dataset=celebahq/celebahq256_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.training.batch_size=8 \
    dataset.diffusion.training.chkpt_interval=5 \
    dataset.diffusion.training.restore_path=latest \
    +dataset.diffusion.training.fsdp=true \
    +dataset.diffusion.training.bf16=true \
    +dataset.diffusion.model.score_fn.gn_bf16=true \
    +dataset.diffusion.training.steps_per_dispatch=4 \
    dataset.diffusion.training.results_dir=${RESULTS_DIR}
