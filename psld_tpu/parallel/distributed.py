"""Multi-host (multi-process) SPMD support.

The reference scales across nodes through Lightning DDP + NCCL
(train_sde.py:114); the TPU-native equivalent is one JAX process per host of
a pod slice, joined with ``jax.distributed.initialize`` and then programmed
as a single global device mesh — the train step itself is unchanged, XLA
lays the gradient all-reduce over ICI/DCN.

Single-host runs (including the virtual CPU mesh used in tests) skip
initialization entirely; every helper degenerates to the trivial values.

Usage (one command per host)::

    PSLD_MULTIHOST=1 python -m psld_tpu.cli.train_sde +dataset=...

On Cloud TPU the coordinator address / process count / process id are
auto-detected from the TPU metadata; elsewhere set the standard JAX
environment variables (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID) or pass explicit kwargs to :func:`maybe_initialize`.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_ENV_FLAG = "PSLD_MULTIHOST"


def multihost_requested() -> bool:
    if os.environ.get(_ENV_FLAG, "").strip() not in ("", "0", "false"):
        return True
    # explicit coordinator config implies a multi-process launch
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))


def maybe_initialize(**kwargs) -> None:
    """Join the multi-process runtime when requested (idempotent).

    Must run before any other JAX call touches the backend. No-op unless
    PSLD_MULTIHOST=1 / JAX_COORDINATOR_ADDRESS is set.
    """
    if not multihost_requested():
        return
    if jax.process_count() > 1:  # already initialized
        return
    jax.distributed.initialize(**kwargs)
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local_batch, offset) of this process's contiguous slice of each
    global batch. Device order in ``make_mesh`` groups each process's local
    devices contiguously, so slice k of the global batch lands on host k's
    chips without any cross-host transfer."""
    idx, count = process_info()
    assert global_batch % count == 0, (
        f"global batch {global_batch} not divisible by {count} processes"
    )
    local = global_batch // count
    return local, idx * local
