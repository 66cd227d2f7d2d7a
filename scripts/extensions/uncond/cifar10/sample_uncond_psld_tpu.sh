#!/bin/bash
# EXTENSION recipe (TPU production variant of
# scripts/sota/uncond/cifar10/sample_uncond_psld.sh): the measured
# operating point for 50k-sample quality runs on one v5e chip —
#   evaluation.bf16=true      +10-25% sampling throughput, quality-gated
#                             for uncond/guided/inpaint/edit/likelihood
#                             (PARITY round-3 section on bf16 inference +
#                             round-4 mode gates)
#   sampler=sscs_sde NFE=100  the reference's low-NFE quality pick; bs64
#                             is the measured throughput optimum
#   nfe_per_dispatch=250      caps any single device dispatch below
#                             tunneled-runtime watchdogs (bit-identical
#                             trajectories, PARITY round-4 section 2) —
#                             a no-op at NFE=100, load-bearing if you
#                             raise n_discrete_steps to 1000
# Set DATA_ROOT / SAVE_PATH / CHKPT_PATH before running.
python -m psld_tpu.cli.sample +dataset=cifar10/cifar10_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.data.name='cifar10' \
    dataset.diffusion.data.norm=True \
    dataset.diffusion.data.hflip=True \
    dataset.diffusion.model.score_fn.in_ch=6 \
    dataset.diffusion.model.score_fn.out_ch=6 \
    dataset.diffusion.model.score_fn.nf=128 \
    dataset.diffusion.model.score_fn.ch_mult='[2,2,2]' \
    dataset.diffusion.model.score_fn.num_res_blocks=8 \
    dataset.diffusion.model.score_fn.attn_resolutions='[16]' \
    dataset.diffusion.model.score_fn.dropout=0.15 \
    dataset.diffusion.model.score_fn.progressive_input='residual' \
    dataset.diffusion.model.score_fn.fir=True \
    dataset.diffusion.model.score_fn.embedding_type='fourier' \
    dataset.diffusion.model.sde.beta_min=8.0 \
    dataset.diffusion.model.sde.beta_max=8.0 \
    dataset.diffusion.model.sde.nu=4.02 \
    dataset.diffusion.model.sde.gamma=0.02 \
    dataset.diffusion.model.sde.kappa=0.04 \
    dataset.diffusion.model.sde.decomp_mode='lower' \
    dataset.diffusion.evaluation.seed=0 \
    dataset.diffusion.evaluation.sample_prefix='tpu' \
    dataset.diffusion.evaluation.save_path=${SAVE_PATH} \
    dataset.diffusion.evaluation.batch_size=64 \
    dataset.diffusion.evaluation.stride_type='uniform' \
    dataset.diffusion.evaluation.sample_from='target' \
    dataset.diffusion.evaluation.workers=1 \
    dataset.diffusion.evaluation.chkpt_path=${CHKPT_PATH} \
    dataset.diffusion.evaluation.sampler.name="sscs_sde" \
    dataset.diffusion.evaluation.n_samples=50000 \
    dataset.diffusion.evaluation.n_discrete_steps=100 \
    +dataset.diffusion.evaluation.bf16=true \
    +dataset.diffusion.evaluation.nfe_per_dispatch=250 \
    dataset.diffusion.evaluation.path_prefix="100"
