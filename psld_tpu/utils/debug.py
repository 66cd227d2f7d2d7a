"""Debug-mode numerics guards.

The reference's covariance factorizations carry explicit NaN checks that
raise ``ValueError("Numerical precision error.")`` (reference
main/models/sde/psld.py:167-171, 180-185, 200-205, 214-219). Python-level
``torch.isnan(...).any()`` checks would force a host sync per call and
cannot live inside a jitted program, so the TPU-native equivalent is a
`checkify`-based guard that is compiled into the program only when
``PSLD_DEBUG_NUMERICS=1`` is set:

- in eager (un-jitted) code the check raises immediately, mirroring the
  reference behavior;
- inside ``jit``/``scan`` the caller functionalizes with
  :func:`checked_call`, which discharges the accumulated error on the host
  after the dispatch (one extra scalar transfer, zero cost when disabled).

Production runs leave the flag unset: the guards then trace to nothing and
the compiled programs are unchanged.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax.experimental import checkify

_ENV_FLAG = "PSLD_DEBUG_NUMERICS"


def numerics_debug_enabled() -> bool:
    """True when PSLD_DEBUG_NUMERICS is set to a truthy value."""
    return os.environ.get(_ENV_FLAG, "").strip() not in ("", "0", "false")


def check_finite(name: str, *arrays) -> None:
    """Insert a finite-ness check over ``arrays`` when debug mode is on.

    No-op (traces to nothing) unless ``PSLD_DEBUG_NUMERICS=1``. The message
    matches the reference's "Numerical precision error." guards
    (psld.py:167-171) with the failing site named.
    """
    if not numerics_debug_enabled():
        return
    ok = jnp.array(True)
    for a in arrays:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(a)))
    checkify.check(ok, f"Numerical precision error in {name}.")


def checked_call(fn, *args, **kwargs):
    """Run ``fn`` with checkify functionalization and throw on any failure.

    Use to execute jitted code containing :func:`check_finite` guards (or to
    enable JAX's automatic NaN/div-by-zero checks) in debug mode::

        out = checked_call(jax.jit(step), state, batch)

    When debug mode is off this is a plain call with zero overhead.
    """
    if not numerics_debug_enabled():
        return fn(*args, **kwargs)
    err, out = checkify.checkify(
        fn, errors=checkify.user_checks | checkify.float_checks
    )(*args, **kwargs)
    err.throw()
    return out
