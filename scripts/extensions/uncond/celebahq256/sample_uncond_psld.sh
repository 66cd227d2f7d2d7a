#!/bin/bash
# EXTENSION recipe: CelebA-HQ-256 PSLD sampling with height-sharded
# inference (one 256x256 sample's activations span 2 chips).
# Set CHKPT_PATH / SAVE_PATH before running.
python -m psld_tpu.cli.sample +dataset=celebahq/celebahq256_psld \
    dataset.diffusion.data.root=/tmp \
    dataset.diffusion.evaluation.chkpt_path=${CHKPT_PATH} \
    dataset.diffusion.evaluation.save_path=${SAVE_PATH} \
    dataset.diffusion.evaluation.n_samples=50000 \
    dataset.diffusion.evaluation.batch_size=8 \
    dataset.diffusion.evaluation.n_discrete_steps=1000 \
    +dataset.diffusion.evaluation.spatial=2 \
    +dataset.diffusion.evaluation.bf16=true \
    +dataset.diffusion.model.score_fn.gn_bf16=true
# gn_bf16: +8.5% at 256px (bf16 GN normalize/act chain, f32 moments);
# single-chip operating point: batch_size=8 measured 62% MFU — bs2/bs4
# sit in an XLA tiling valley (PARITY round-5 section 2).
