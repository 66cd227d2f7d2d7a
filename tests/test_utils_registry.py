"""Registry and utility-helper tests: the string-keyed factory contract
(reference util.py:33-62) and the cancellation-safe numerics that replace
the reference's float64-everywhere policy (SURVEY.md section 7)."""

import numpy as np
import pytest

import psld_tpu

psld_tpu.import_modules_into_registry()

from psld_tpu import registry  # noqa: E402
from psld_tpu.utils.images import data_scaler, to_uint8  # noqa: E402
from psld_tpu.utils.numerics import (  # noqa: E402
    bcast_right,
    expm1_div_x,
    ou_weight_integrals,
)


def test_registry_categories_populated():
    for cat, name in [("sde", "psld"), ("sde", "vpsde"),
                      ("score_fn", "ncsnpp"), ("clf_fn", "ncsnpp_clf"),
                      ("losses", "psld_score_loss"), ("losses", "score_loss"),
                      ("losses", "tce_loss"), ("samplers", "em_sde"),
                      ("samplers", "sscs_sde"), ("samplers", "cc_em_sde"),
                      ("samplers", "ip_em_sde"), ("samplers", "bb_ode"),
                      ("samplers", "rk_ode"), ("datasets", "cifar10")]:
        assert registry.get_module(cat, name) is not None, (cat, name)


def test_registry_unknown_name_raises():
    with pytest.raises((KeyError, ValueError)):
        registry.get_module("samplers", "does_not_exist")


def test_registry_duplicate_name_guard():
    @registry.register_module(category="losses", name="_dup_test")
    class A:  # noqa: N801
        pass

    with pytest.raises((ValueError, KeyError)):
        @registry.register_module(category="losses", name="_dup_test")
        class B:  # noqa: N801
            pass


def test_data_scaler_modes():
    img = np.asarray([[0, 127, 255]], np.uint8)
    np.testing.assert_allclose(data_scaler(img, norm=False),
                               [[0.0, 127 / 255, 1.0]], atol=1e-6)
    scaled = data_scaler(img, norm=True)
    assert scaled.min() >= -1.0 and scaled.max() <= 1.0
    np.testing.assert_allclose(scaled[0, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(scaled[0, 2], 1.0, atol=1e-6)


def test_to_uint8_roundtrip():
    x = np.linspace(-1, 1, 16, dtype=np.float32).reshape(1, 4, 4)
    u = to_uint8(x, denorm=True)
    assert u.dtype == np.uint8 and u.min() == 0 and u.max() == 255


def test_bcast_right():
    import jax.numpy as jnp

    t = jnp.arange(3.0)
    assert bcast_right(t, 4).shape == (3, 1, 1, 1)
    assert bcast_right(t, 1).shape == (3,)


def test_ou_integrals_match_quadrature():
    """I_k = int_0^s u^k e^{-lam2 u} du vs numpy quadrature, including the
    tiny-x cancellation regime and the negative-s SSCS half-step regime."""
    import jax.numpy as jnp

    for lam2, s in [(4.02, 0.5), (4.02, 1e-6), (0.5, -0.3), (8.0, 2.0)]:
        i0, i1, i2 = ou_weight_integrals(lam2, jnp.asarray(s))
        u = np.linspace(0.0, s, 200_001)
        w = np.exp(-lam2 * u)
        for k, got in enumerate((i0, i1, i2)):
            want = np.trapezoid(u**k * w, u)
            np.testing.assert_allclose(float(got), want, rtol=1e-5,
                                       atol=1e-22, err_msg=f"{lam2=} {s=} {k=}")


def test_expm1_div_x_small_and_large():
    import jax.numpy as jnp

    xs = jnp.asarray([1e-10, 1e-5, 0.1, 2.0, -0.5])
    got = np.asarray(expm1_div_x(xs), np.float64)
    want = np.expm1(np.asarray(xs, np.float64)) / np.asarray(xs, np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tune_host_allocator_applies_and_respects_optout(monkeypatch):
    import pytest

    from psld_tpu.utils.hostmem import tune_host_allocator

    if not tune_host_allocator():
        pytest.skip("no glibc mallopt on this platform (graceful no-op)")
    monkeypatch.setenv("PSLD_NO_MALLOC_TUNE", "1")
    assert tune_host_allocator() is False
