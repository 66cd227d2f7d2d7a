"""Convert a reference (mandt-lab/PSLD) PyTorch Lightning checkpoint into an
orbax checkpoint usable as ``evaluation.chkpt_path`` / ``training.
restore_path``.

Usage::

    python -m psld_tpu.cli.convert_checkpoint SRC.ckpt OUT_DIR \
        +dataset=cifar10/cifar10_psld <model overrides matching the ckpt>
    python -m psld_tpu.cli.convert_checkpoint SRC.ckpt OUT_DIR --clf \
        +dataset=cifar10/cifar10_psld <clf model overrides>

The model overrides must reproduce the architecture the checkpoint was
trained with (same keys as the reference's own sampling scripts). The
converted state carries {params, ema_params} from the checkpoint and a
fresh optimizer state at step 0.
"""

from __future__ import annotations

import re
import sys

# a Hydra-style override is `key=value` / `+key=value` with a dotted
# identifier key; checkpoint PATHS can legitimately contain `=` (Lightning
# names like `...-epoch=0999.ckpt`, our `...-epoch=0042` dirs), so an
# `=`-bearing arg still counts as positional when it points at an existing
# file or carries a checkpoint extension (Lightning's DEFAULT filename
# `epoch=0-step=999.ckpt` would otherwise parse as an override)
_OVERRIDE = re.compile(r"^\+?[\w.]+=")


def _split_args(argv):
    import os

    def is_positional(a):
        if not _OVERRIDE.match(a):
            return True
        return os.path.exists(a) or a.endswith((".ckpt", ".pt", ".pth"))

    positional = [a for a in argv if is_positional(a)]
    overrides = [a for a in argv if not is_positional(a)]
    return positional, overrides


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

    import os

    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train import torch_import
    from psld_tpu.train.loop import (build_clf_model, build_score_model,
                                     init_score_params)
    from psld_tpu.train.state import init_state, make_optimizer

    if not is_clf:
        dcfg = cfg.dataset.diffusion
        net = build_score_model(dcfg)
        params0 = init_score_params(net, dcfg, 0)
        params, ema_params = torch_import.convert_score_checkpoint(src, dcfg)
        torch_import.verify_tree(params, params0)
        torch_import.verify_tree(ema_params, params0)
        state = init_state(params0,
                           make_optimizer(dcfg.training.optimizer))
        state = state.replace(params=params, ema_params=ema_params)
    else:
        ccfg = cfg.dataset.clf
        net, params0 = build_clf_model(ccfg)
        params = torch_import.convert_clf_checkpoint(src, ccfg)
        torch_import.verify_tree(params, params0)
        state = init_state(params0,
                           make_optimizer(ccfg.training.optimizer))
        state = state.replace(params=params, ema_params=params)

    path = ckpt.save_checkpoint(os.path.dirname(os.path.abspath(out)),
                                os.path.basename(out), state)
    print(path)


if __name__ == "__main__":
    main()
