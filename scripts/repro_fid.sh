#!/bin/bash
# One-command FID reproduction (reference protocol: scripts_psld/fid.sh:1,
# README.md:136 — 50k samples vs the training set, published CIFAR-10
# FID 2.10, README.md:22).
#
# Inputs (env vars):
#   DATA_ROOT     staged data root (scripts/prepare_data.py --root $DATA_ROOT cifar10)
#   FID_WEIGHTS   pt_inception-2015-12-05 state_dict (.pth)
#   CHKPT_PATH    orbax checkpoint dir — OR —
#   REF_CKPT      a reference Lightning .ckpt to convert first
#   OUT           working dir (samples + stats), default ./repro_fid_out
#   N_SAMPLES     default 50000;  NFE default 1000 (the SOTA quality point)
#   SAMPLER       default em_sde (reference recipe); sscs_sde is ~10x faster
#                 at NFE 100 with near-par quality
#
# Usage:
#   DATA_ROOT=/data FID_WEIGHTS=/w/pt_inception-2015-12-05.pth \
#     REF_CKPT=/ckpts/psld_cifar10.ckpt bash scripts/repro_fid.sh
set -euo pipefail

OUT=${OUT:-./repro_fid_out}
N_SAMPLES=${N_SAMPLES:-50000}
NFE=${NFE:-1000}
SAMPLER=${SAMPLER:-em_sde}
mkdir -p "$OUT"

# The SOTA CIFAR-10 architecture (reference scripts_psld/sota/uncond/
# cifar10/train_uncond_psld.sh:8-31) — override via MODEL_OVERRIDES for a
# differently-shaped checkpoint.
MODEL_OVERRIDES=${MODEL_OVERRIDES:-"
    dataset.diffusion.model.score_fn.nf=128
    dataset.diffusion.model.score_fn.ch_mult=[2,2,2]
    dataset.diffusion.model.score_fn.num_res_blocks=8
    dataset.diffusion.model.score_fn.dropout=0.15
    dataset.diffusion.model.score_fn.progressive_input=residual
    dataset.diffusion.model.score_fn.fir=True
    dataset.diffusion.model.score_fn.embedding_type=fourier
    dataset.diffusion.model.sde.nu=4.02
    dataset.diffusion.model.sde.gamma=0.02
"}

if [[ -n "${REF_CKPT:-}" ]]; then
    CHKPT_PATH="$OUT/converted_ckpt"
    echo "== converting reference checkpoint -> $CHKPT_PATH"
    # shellcheck disable=SC2086
    python -m psld_tpu.cli.convert_checkpoint "$REF_CKPT" "$CHKPT_PATH" \
        +dataset=cifar10/cifar10_psld $MODEL_OVERRIDES
fi
: "${CHKPT_PATH:?set CHKPT_PATH (orbax dir) or REF_CKPT (.ckpt to convert)}"
: "${FID_WEIGHTS:?set FID_WEIGHTS to the pt_inception-2015-12-05 .pth}"
: "${DATA_ROOT:?set DATA_ROOT (scripts/prepare_data.py --root ... cifar10)}"

echo "== sampling $N_SAMPLES images ($SAMPLER, NFE=$NFE) -> $OUT/samples"
# shellcheck disable=SC2086
python -m psld_tpu.cli.sample +dataset=cifar10/cifar10_psld \
    $MODEL_OVERRIDES \
    dataset.diffusion.data.root="$DATA_ROOT" \
    dataset.diffusion.evaluation.chkpt_path="$CHKPT_PATH" \
    dataset.diffusion.evaluation.sample_from=target \
    dataset.diffusion.evaluation.save_path="$OUT/samples" \
    dataset.diffusion.evaluation.sample_prefix=tpu \
    dataset.diffusion.evaluation.batch_size=64 \
    dataset.diffusion.evaluation.n_samples="$N_SAMPLES" \
    dataset.diffusion.evaluation.n_discrete_steps="$NFE" \
    dataset.diffusion.evaluation.sampler.name="$SAMPLER" \
    dataset.diffusion.evaluation.path_prefix="$NFE"

echo "== staging the training images for the reference side"
python - "$DATA_ROOT" "$OUT/train_pngs" <<'EOF'
import os
import sys

import numpy as np

import psld_tpu

psld_tpu.import_modules_into_registry()
from psld_tpu.registry import get_module
from psld_tpu.utils.images import save_as_images

root, out = sys.argv[1], sys.argv[2]
os.makedirs(out, exist_ok=True)
ds = get_module("datasets", "cifar10")(root=root, norm=True)
imgs = np.stack([ds[i] for i in range(len(ds))])
save_as_images(imgs, file_name=f"{out}/train", denorm=True)
print(f"wrote {len(ds)} training PNGs to {out}")
EOF

echo "== FID (on-TPU InceptionV3; reference gate: CIFAR-10 2.10)"
# writer layout: <save_path>/<path_prefix>/images/*.png
python -m psld_tpu.cli.fid \
    --input1 "$OUT/samples/$NFE/images" --input2 "$OUT/train_pngs" \
    --weights "$FID_WEIGHTS"
