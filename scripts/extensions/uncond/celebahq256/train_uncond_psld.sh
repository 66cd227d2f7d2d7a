#!/bin/bash
# EXTENSION recipe (no reference counterpart): CelebA-HQ-256 PSLD training
# -- the PSLD paper's high-res experiment, productized with the TPU
# scaling knobs this framework adds. At 256x256 activations bound the
# per-chip batch, so the recipe turns on per-resblock remat, ZeRO-3
# parameter sharding, 2-way height (spatial) sharding, and gradient
# accumulation to reach an effective batch of
#   batch_size x (devices/spatial) x grad_accum  =  8 x 4 x 2  =  64
# on an 8-chip v5e slice. Set DATA_ROOT / RESULTS_DIR before running.
python -m psld_tpu.cli.train_sde +dataset=celebahq/celebahq256_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.training.batch_size=8 \
    dataset.diffusion.training.chkpt_interval=5 \
    dataset.diffusion.training.restore_path=latest \
    +dataset.diffusion.training.remat=true \
    +dataset.diffusion.training.fsdp=true \
    +dataset.diffusion.training.spatial=2 \
    +dataset.diffusion.training.grad_accum=2 \
    +dataset.diffusion.training.bf16=true \
    +dataset.diffusion.model.score_fn.gn_bf16=true \
    +dataset.diffusion.training.steps_per_dispatch=4 \
    dataset.diffusion.training.results_dir=${RESULTS_DIR}
