"""Orbax checkpointing.

Reference parity (train_sde.py:67-73, SURVEY.md section 5): save
{params, ema_params, opt_state, step} every ``chkpt_interval`` epochs with a
keep-all policy and a ``<sde>-<prefix>-epoch=<N>-loss=<L>`` directory name;
resume restores optimizer state and step (Lightning ``ckpt_path`` parity).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def checkpoint_name(sde_type: str, prefix: str, epoch: int,
                    loss: float) -> str:
    prefix = prefix or "psld"
    return f"{sde_type}-{prefix}-epoch={epoch:04d}-loss={loss:.4f}"


def save_checkpoint(directory: str, name: str, state: Any) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, name))
    with _checkpointer() as ckptr:
        ckptr.save(path, state)
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for entry in os.listdir(directory):
        m = re.search(r"epoch=(\d+)", entry)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = entry, int(m.group(1))
    return os.path.join(directory, best) if best else None


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    """Restore into the structure of ``abstract_state`` (a matching pytree,
    e.g. a freshly initialized TrainState)."""
    with _checkpointer() as ckptr:
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        abstract_state)
        try:
            return ckptr.restore(os.path.abspath(path), target)
        except (ValueError, KeyError) as e:
            # orbax's errors don't say WHY in user terms; the two common
            # causes are architecture-mismatched overrides and a
            # truncated/corrupt checkpoint (e.g. preempted mid-save)
            raise ValueError(
                f"failed to restore {path!r}: either the model overrides "
                "(nf, ch_mult, num_res_blocks, attn_resolutions, fir, "
                "embedding_type, progressive*, in/out_ch) do not match the "
                "architecture the checkpoint was trained with, or the "
                "checkpoint itself is incomplete/corrupt. "
                f"Original error: {e}"
            ) from e


def epoch_from_path(path: str) -> int:
    m = re.search(r"epoch=(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0
