#!/bin/bash
# TPU-native EXTRA: the reference ODE recipe with the on-device adaptive RK45
# (single compiled lax.while_loop, zero host sync; bb_ode parity semantics).
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and
# CLF_CHKPT_PATH / MASK_PATH where applicable) before running.
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
    dataset.diffusion.evaluation.batch_size=16 \
    dataset.diffusion.evaluation.sample_from='target' \
    dataset.diffusion.evaluation.workers=1 \
    dataset.diffusion.evaluation.chkpt_path=${CHKPT_PATH} \
    dataset.diffusion.evaluation.sampler.name="adaptive_ode" \
    dataset.diffusion.evaluation.sampler.solver="RK45" \
    dataset.diffusion.evaluation.sampler.rtol=1e-4 \
    dataset.diffusion.evaluation.sampler.atol=1e-4 \
    dataset.diffusion.evaluation.n_samples=50000 \
    dataset.diffusion.evaluation.path_prefix="tol=1e-4"
