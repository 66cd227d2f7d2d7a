"""Host allocator tuning for slow-page-fault environments.

Some virtualized hosts (lazily-faulted microVM memory; post-restore
snapshots) serve FIRST-TOUCH page faults orders of magnitude slower than
already-mapped memory — measured on one such v5e-attached host: writing
fresh pages ran at ~6 MB/s while re-writing faulted pages ran at ~10 GB/s,
turning every large numpy allocation in the data path into seconds of
fault time (a 25 MB batch cast cost 5.9 s).

glibc routes allocations above M_MMAP_THRESHOLD (default 128 KB, exactly
the size of every image batch) through fresh ``mmap``/``munmap`` pairs, so
the SAME pages are faulted in again on every batch. Raising the threshold
keeps large blocks on the main heap, where freed pages are reused already
faulted: the 50 MB alloc+write benchmark drops from 1.6 s to 0.013 s
(120x) and the batch cast from 5.9 s to 0.35 s.

Cost: large freed blocks are retained in RSS (heap fragmentation) instead
of returning to the OS — irrelevant for a training process that cycles
same-shaped buffers. Set ``PSLD_NO_MALLOC_TUNE=1`` to skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging
import os

logger = logging.getLogger(__name__)

_M_MMAP_THRESHOLD = -3  # glibc malloc.h


def tune_host_allocator(threshold: int = 1 << 30) -> bool:
    """Raise glibc's mmap threshold so large numpy buffers reuse faulted
    heap pages. Returns True when applied; safe no-op elsewhere."""
    if os.environ.get("PSLD_NO_MALLOC_TUNE", "").strip() not in ("", "0"):
        return False
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, int(threshold)))
        if ok:
            logger.debug("mallopt(M_MMAP_THRESHOLD, %d) applied", threshold)
        return ok
    except Exception:  # non-glibc / restricted platforms: leave defaults
        return False
