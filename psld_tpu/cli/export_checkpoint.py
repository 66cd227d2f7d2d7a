"""Export a psld-tpu orbax checkpoint to a reference (mandt-lab/PSLD)
PyTorch Lightning checkpoint, loadable by the reference's eval tooling
(wrapper.py:31 ``score_fn.``/``ema_score_fn.`` prefixes, clf_wrapper.py
``clf_fn.``).

Usage::

    python -m psld_tpu.cli.export_checkpoint SRC_ORBAX_DIR OUT.ckpt \
        +dataset=cifar10/cifar10_psld <model overrides matching the ckpt>
    python -m psld_tpu.cli.export_checkpoint SRC_ORBAX_DIR OUT.ckpt --clf \
        +dataset=cifar10/cifar10_psld <clf model overrides>

The model overrides must reproduce the architecture the checkpoint was
trained with (the module walk is config-derived).
"""

from __future__ import annotations

import sys

from psld_tpu.cli.convert_checkpoint import _split_args


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    is_clf = "--clf" in argv
    if is_clf:
        argv.remove("--clf")
    positional, overrides = _split_args(argv)
    if len(positional) != 2:
        raise SystemExit(__doc__)
    src, out = positional

    from psld_tpu.cli._common import bootstrap

    cfg = bootstrap(overrides)

    import jax

    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train import torch_export
    from psld_tpu.train.loop import (build_clf_model, build_score_model,
                                     init_score_params)
    from psld_tpu.train.state import init_state, make_optimizer

    if not is_clf:
        dcfg = cfg.dataset.diffusion
        net = build_score_model(dcfg)
        params0 = init_score_params(net, dcfg, 0)
        abstract = init_state(params0, make_optimizer(dcfg.training.optimizer))
        state = ckpt.restore_checkpoint(src, abstract)
        sd = torch_export.export_score_state_dict(
            jax.device_get(state.params), jax.device_get(state.ema_params),
            dcfg)
        step = int(state.step)
    else:
        ccfg = cfg.dataset.clf
        net, params0 = build_clf_model(ccfg)
        abstract = init_state(params0, make_optimizer(ccfg.training.optimizer))
        state = ckpt.restore_checkpoint(src, abstract)
        sd = torch_export.export_clf_state_dict(
            jax.device_get(state.params), ccfg)
        step = int(state.step)

    torch_export.save_lightning_checkpoint(out, sd, step=step)
    print(out)


if __name__ == "__main__":
    main()
