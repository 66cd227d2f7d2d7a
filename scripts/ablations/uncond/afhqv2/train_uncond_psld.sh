#!/bin/bash
# TPU-native recipe mirroring the reference scripts_psld/ablations/uncond/afhqv2/train_uncond_psld.sh.
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and CLF_CHKPT_PATH
# for guided sampling) before running.
python -m psld_tpu.cli.train_sde +dataset=afhqv2/afhqv2128_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.data.norm=True \
    dataset.diffusion.data.hflip=True \
    dataset.diffusion.data.name='afhqv2' \
    dataset.diffusion.training.seed=0 \
    dataset.diffusion.training.chkpt_interval=50 \
    dataset.diffusion.training.mode='hsm' \
    dataset.diffusion.training.use_ema=True \
    dataset.diffusion.training.batch_size=32 \
    dataset.diffusion.training.epochs=500 \
    dataset.diffusion.training.results_dir=${RESULTS_DIR} \
    dataset.diffusion.training.workers=1
