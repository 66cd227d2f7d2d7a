#!/bin/bash
# TPU-native recipe mirroring the reference scripts_psld/ablations/uncond/cifar10/sample_uncond_vpsde.sh (full override set).
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and
# CLF_CHKPT_PATH / MASK_PATH where applicable) before running.
python -m psld_tpu.cli.sample +dataset=cifar10/cifar10_vpsde \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.data.name='cifar10' \
    dataset.diffusion.data.norm=True \
    dataset.diffusion.data.hflip=True \
    dataset.diffusion.model.score_fn.in_ch=3 \
    dataset.diffusion.model.score_fn.out_ch=3 \
    dataset.diffusion.model.score_fn.nf=128 \
    dataset.diffusion.model.score_fn.ch_mult='[1,2,2,2]' \
    dataset.diffusion.model.score_fn.num_res_blocks=2 \
    dataset.diffusion.model.score_fn.attn_resolutions='[16]' \
    dataset.diffusion.model.score_fn.dropout=0.1 \
    dataset.diffusion.model.sde.beta_min=0.1 \
    dataset.diffusion.model.sde.beta_max=20 \
    dataset.diffusion.evaluation.seed=0 \
    dataset.diffusion.evaluation.sample_prefix='tpu' \
    dataset.diffusion.evaluation.save_path=${SAVE_PATH} \
    dataset.diffusion.evaluation.batch_size=16 \
    dataset.diffusion.evaluation.stride_type='quadratic' \
    dataset.diffusion.evaluation.sample_from='target' \
    dataset.diffusion.evaluation.workers=1 \
    dataset.diffusion.evaluation.chkpt_path=${CHKPT_PATH} \
    dataset.diffusion.evaluation.sampler.name="em_sde" \
    dataset.diffusion.evaluation.n_samples=10000 \
    dataset.diffusion.evaluation.n_discrete_steps=1000 \
    dataset.diffusion.evaluation.path_prefix="1000"
