"""Debug-mode numerics guards (reference NaN checks, psld.py:167-171).

PSLD_DEBUG_NUMERICS=1 compiles finite-ness checks into the covariance
factorizations; production runs (flag unset) trace to nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.utils.debug import check_finite, checked_call

from test_sde_psld import make_sde


@pytest.fixture
def debug_numerics(monkeypatch):
    monkeypatch.setenv("PSLD_DEBUG_NUMERICS", "1")


def _singular_var(sde):
    """A covariance whose Cholesky produces NaN (mm - l21^2 < 0)."""
    xx = jnp.asarray([1e-12])
    xm = jnp.asarray([1.0])
    mm = jnp.asarray([1e-12])
    return xx, xm, mm


def test_disabled_is_silent():
    sde = make_sde()
    out = sde.get_coeff(_singular_var(sde))  # NaN flows through silently
    assert np.isnan(np.asarray(out[3])).all()
    # checked_call degenerates to a plain call
    assert checked_call(lambda x: x + 1, 1) == 2


def test_eager_raise_matches_reference(debug_numerics):
    sde = make_sde()
    with pytest.raises(Exception, match="Numerical precision error"):
        sde.get_coeff(_singular_var(sde))


def test_eager_raise_upper_inverse(debug_numerics):
    sde = make_sde(decomp="upper")
    with pytest.raises(Exception, match="Numerical precision error"):
        sde.get_inv_coeff((jnp.asarray([1.0]), jnp.asarray([2.0]),
                           jnp.asarray([1.0])))  # negative determinant


def test_checked_call_under_jit(debug_numerics):
    sde = make_sde()

    def factor(var):
        return sde.get_coeff(var)

    with pytest.raises(Exception, match="Numerical precision error"):
        checked_call(jax.jit(factor), _singular_var(sde))

    # healthy covariance passes through unchanged (eager call as oracle;
    # a plain jit of guarded code is deliberately an error under the flag)
    var = sde._cov(0.0, sde.mm_0, jnp.asarray([0.5]))
    got = checked_call(jax.jit(factor), var)
    want = factor(var)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_checked_call_inside_scan(debug_numerics):
    # guards functionalize through lax.scan (the sampler-loop shape)
    def step(c, _):
        check_finite("scan step", c)
        return c * 2.0, None

    def run(x):
        out, _ = jax.lax.scan(step, x, None, length=4)
        return out

    got = checked_call(jax.jit(run), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(got), [16.0])
    with pytest.raises(Exception, match="scan step"):
        checked_call(jax.jit(run), jnp.asarray([jnp.nan]))
