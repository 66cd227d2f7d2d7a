#!/bin/bash
# On-TPU FID between two sample directories (replaces torch-fidelity;
# reference scripts_psld/fid.sh). Requires the pt_inception weights file.
python -m psld_tpu.cli.fid --input1 "$1" --input2 "$2" --weights "${FID_WEIGHTS}"
