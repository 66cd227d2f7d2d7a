#!/bin/bash
# TPU-native recipe mirroring the reference scripts_psld/ablations/cond/cifar10/train_tclf_psld.sh.
# Set DATA_ROOT / RESULTS_DIR / SAVE_PATH / CHKPT_PATH (and CLF_CHKPT_PATH
# for guided sampling) before running.
python -m psld_tpu.cli.train_clf +dataset=cifar10/cifar10_psld \
    dataset.diffusion.data.root=${DATA_ROOT} \
    dataset.diffusion.model.sde.nu=4.01 \
    dataset.diffusion.model.sde.gamma=0.01 \
    dataset.diffusion.model.sde.kappa=0.04 \
    dataset.clf.data.root=${DATA_ROOT} \
    dataset.clf.data.name='cifar10' \
    dataset.clf.model.clf_fn.n_cls=10 \
    dataset.clf.training.batch_size=128 \
    dataset.clf.training.epochs=100 \
    dataset.clf.training.results_dir=${RESULTS_DIR}
