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


class AsyncSaver:
    """Long-lived async checkpoint writer for training loops.

    ``StandardCheckpointer`` is an orbax AsyncCheckpointer: ``save()``
    returns once the device->host copy is done (so donated state buffers
    may be overwritten by the next step immediately) while serialization
    and fsync run on orbax's background thread -- the checkpoint's write
    time overlaps the NEXT interval of training instead of stalling the
    step loop. The reference's Lightning callback blocks training for the
    whole write (reference train_sde.py:67-73).

    A new ``save()`` first drains the previous write (at most one
    outstanding checkpoint). ALWAYS ``close()`` before process exit --
    it waits for the last write and surfaces any background error.
    """

    def __init__(self):
        self._ckptr = _checkpointer()

    def save(self, directory: str, name: str, state: Any) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.abspath(os.path.join(directory, name))
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, state)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self) -> "AsyncSaver":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    best, best_key = None, (-1, -1.0)
    for entry in os.listdir(directory):
        full = os.path.join(directory, entry)
        # skip the .meta.json resume sidecars (and any stray files):
        # checkpoints are orbax DIRECTORIES
        if not os.path.isdir(full):
            continue
        # skip in-flight/abandoned async writes: a preemption mid-save
        # leaves '<name>.orbax-checkpoint-tmp' behind, which would
        # otherwise win the epoch comparison and crash every auto-resume
        if ".orbax-checkpoint-tmp" in entry:
            continue
        m = re.search(r"epoch=(\d+)", entry)
        if not m:
            continue
        # interrupted->replay runs can write the SAME epoch twice; break
        # ties by mtime so resume picks the newer state deterministically
        key = (int(m.group(1)), os.path.getmtime(full))
        if key > best_key:
            best, best_key = entry, key
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


def write_meta(path: str, epoch: int, complete: bool,
               extra: dict | None = None) -> None:
    """Sidecar resume metadata (``<ckpt>.meta.json``, NEXT TO the orbax
    directory -- orbax validates the directory contents on restore).

    ``complete=True``: the named epoch finished -- resume at epoch+1
    (Lightning ``ckpt_path`` semantics, reference train_sde.py:117-120).
    ``complete=False``: preemption/max_steps stopped mid-epoch -- resume
    REPLAYS that epoch from its start so no data is silently skipped
    (the restored step counter still advances monotonically)."""
    import json

    rec = {"epoch": int(epoch), "complete": bool(complete)}
    if extra:
        rec.update(extra)
    with open(path + ".meta.json", "w") as f:
        json.dump(rec, f)


def resume_epoch(path: str) -> int:
    """First epoch to run when resuming from ``path``. Prefers the meta
    sidecar; falls back to the filename (old checkpoints: conservative
    replay of the named epoch)."""
    import json

    meta_path = str(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        return int(meta["epoch"]) + (1 if meta.get("complete") else 0)
    return epoch_from_path(str(path))
