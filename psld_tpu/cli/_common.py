"""Shared CLI bootstrap: x64, compile cache, registry, logging, config."""

from __future__ import annotations

import logging
import sys


def bootstrap(argv=None):
    import psld_tpu

    psld_tpu.enable_x64()  # also tunes the host allocator (utils/hostmem)
    psld_tpu.setup_cache()
    psld_tpu.import_modules_into_registry()
    # join the multi-process runtime before anything touches the backend
    # (no-op unless PSLD_MULTIHOST=1 / JAX_COORDINATOR_ADDRESS is set)
    from psld_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    from psld_tpu.config import compose

    return compose(sys.argv[1:] if argv is None else list(argv))


def console(fn):
    """Console-script wrapper for a value-returning ``main``.

    ``pip``'s generated entry point runs ``sys.exit(main())``; our mains
    return useful values for tests and library callers (sample counts,
    FID floats, train states), which sys.exit would turn into a non-zero
    exit status (or print to stderr). The wrapper swallows the value.
    """
    import functools

    @functools.wraps(fn)
    def cli(*args, **kwargs):
        fn(*args, **kwargs)

    return cli
