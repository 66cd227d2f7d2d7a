#!/bin/bash
# TPU-native recipe mirroring the reference scripts_psld/ablations/uncond/cifar10/train_uncond_vpsde.sh.
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and CLF_CHKPT_PATH
# for guided sampling) before running.
python -m psld_tpu.cli.train_sde +dataset=cifar10/cifar10_vpsde \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.data.norm=True \
    dataset.diffusion.data.hflip=True \
    dataset.diffusion.data.name='cifar10' \
    dataset.diffusion.training.seed=0 \
    dataset.diffusion.training.chkpt_interval=50 \
    dataset.diffusion.training.mode='hsm' \
    dataset.diffusion.training.use_ema=True \
    dataset.diffusion.training.batch_size=128 \
    dataset.diffusion.training.epochs=500 \
    dataset.diffusion.training.results_dir=${RESULTS_DIR} \
    dataset.diffusion.training.workers=1
