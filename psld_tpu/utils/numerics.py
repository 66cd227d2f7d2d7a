"""Numerics helpers shared by the SDE math core.

Precision policy (SURVEY.md section 7): every delicate quantity in PSLD is a
function of the per-batch time vector only (shape ``[B]``), so we compute the
coefficient pipeline in float64 -- software floats on TPU cost nothing at this
shape -- and broadcast into float32 image tensors at the edge. When x64 is
disabled (plain library use) the same code runs in float32 with Taylor-series
switches protecting the small-t regime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_dtype() -> jnp.dtype:
    """float64 when x64 is enabled, else float32."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def bcast_right(t: jax.Array, ndim: int) -> jax.Array:
    """Broadcast a per-batch vector ``[B]`` to rank ``ndim`` (``[B,1,1,1]``).

    Equivalent to the reference's ``util.reshape`` (main/util.py:13-22) but
    takes a target rank instead of a reference tensor.
    """
    if t.ndim == ndim:
        return t
    return t.reshape(t.shape + (1,) * (ndim - t.ndim))


def expm1_div_x(x: jax.Array) -> jax.Array:
    """(e^x - 1)/x, accurate near 0."""
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    exact = jnp.expm1(safe) / safe
    taylor = 1.0 + x / 2.0 + x * x / 6.0
    return jnp.where(small, taylor, exact)


def _phi1(x: jax.Array) -> jax.Array:
    """phi1(x) = (1 - e^{-x}(1+x)) / x^2  -> 1/2 as x -> 0.

    This is ``I1 / s^2`` for the OU covariance integral; the direct form
    cancels catastrophically below x ~ sqrt(eps), so switch to the series.
    """
    small = jnp.abs(x) < 1e-2
    safe = jnp.where(small, 1.0, x)
    exact = (1.0 - jnp.exp(-safe) * (1.0 + safe)) / (safe * safe)
    # series: 1/2 - x/3 + x^2/8 - x^3/30 + x^4/144
    taylor = 0.5 - x / 3.0 + x**2 / 8.0 - x**3 / 30.0 + x**4 / 144.0
    return jnp.where(small, taylor, exact)


def _phi2(x: jax.Array) -> jax.Array:
    """phi2(x) = (2 - e^{-x}(2 + 2x + x^2)) / x^3  -> 1/3 as x -> 0."""
    small = jnp.abs(x) < 5e-2
    safe = jnp.where(small, 1.0, x)
    exact = (2.0 - jnp.exp(-safe) * (2.0 + 2.0 * safe + safe * safe)) / safe**3
    # series: 1/3 - x/4 + x^2/10 - x^3/36 + x^4/168
    taylor = 1.0 / 3.0 - x / 4.0 + x**2 / 10.0 - x**3 / 36.0 + x**4 / 168.0
    return jnp.where(small, taylor, exact)


def ou_weight_integrals(lam2: float, s: jax.Array) -> tuple[jax.Array, ...]:
    """The three scalar integrals of the linear-SDE covariance solution.

    With ``x = lam2 * s``::

        I0 = int_0^s e^{-lam2 u} du          = s * (1 - e^{-x}) / x
        I1 = int_0^s u e^{-lam2 u} du        = s^2 * phi1(x)
        I2 = int_0^s u^2 e^{-lam2 u} du      = s^3 * phi2(x)

    All three are evaluated in cancellation-safe form so they remain accurate
    for |x| << 1 (the t -> 0 regime that forces the reference into float64,
    main/models/wrapper.py:72) *and* for x < 0 (the SSCS reverse-time
    half-steps integrate with negative ds).
    """
    x = lam2 * s
    # expm1_div_x(-x) = (e^{-x} - 1)/(-x) = (1 - e^{-x})/x
    i0 = s * expm1_div_x(-x)
    i1 = s * s * _phi1(x)
    i2 = s * s * s * _phi2(x)
    return i0, i1, i2
