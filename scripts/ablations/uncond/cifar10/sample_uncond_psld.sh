#!/bin/bash
# TPU-native recipe mirroring the reference scripts_psld/ablations/uncond/cifar10/sample_uncond_psld.sh.
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and CLF_CHKPT_PATH
# for guided sampling) before running.
python -m psld_tpu.cli.sample +dataset=cifar10/cifar10_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.data.norm=True \
    dataset.diffusion.data.hflip=True \
    dataset.diffusion.data.name='cifar10' \
    dataset.diffusion.model.sde.nu=4.01 \
    dataset.diffusion.model.sde.gamma=0.01 \
    dataset.diffusion.model.sde.kappa=0.04 \
    dataset.diffusion.evaluation.seed=0 \
    dataset.diffusion.evaluation.sample_prefix='tpu' \
    dataset.diffusion.evaluation.save_path=${SAVE_PATH} \
    dataset.diffusion.evaluation.batch_size=64 \
    dataset.diffusion.evaluation.stride_type='uniform' \
    dataset.diffusion.evaluation.sample_from='target' \
    dataset.diffusion.evaluation.chkpt_path=${CHKPT_PATH} \
    dataset.diffusion.evaluation.sampler.name="em_sde" \
    dataset.diffusion.evaluation.n_samples=50000 \
    dataset.diffusion.evaluation.n_discrete_steps=1000
