"""PSLD SDE math tests: oracle parity, kernel identities, factorizations,
Monte-Carlo marginals (SURVEY.md section 4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.config import ConfigDict
from psld_tpu.sde.psld import PSLD, join_xm, split_xm
from oracles import PSLDOracle

# the (nu, gamma) grid used by the reference's SOTA + ablation configs
PARAM_GRID = [
    (4.01, 0.01),
    (4.02, 0.02),
    (4.005, 0.005),
    (4.0, 0.0),   # score_m mode (AFHQ inpainting recipe)
    (1.0, 2.0),
]


def make_sde(nu=4.01, gamma=0.01, beta=8.0, kappa=0.04, decomp="lower"):
    cfg = ConfigDict(
        {
            "model": {
                "sde": {
                    "beta_min": beta,
                    "beta_max": beta,
                    "nu": nu,
                    "gamma": gamma,
                    "kappa": kappa,
                    "decomp_mode": decomp,
                    "numerical_eps": 1e-9,
                    "n_timesteps": 1000,
                    "is_augmented": True,
                }
            }
        }
    )
    return PSLD(cfg)


TS = np.array([1e-5, 1e-4, 1e-3, 1e-2, 0.1, 0.35, 0.7, 0.999, 1.0])


@pytest.mark.parametrize("nu,gamma", PARAM_GRID)
def test_cov_matches_reference_oracle(nu, gamma):
    sde = make_sde(nu=nu, gamma=gamma)
    oracle = PSLDOracle(8.0, 8.0, nu, gamma, 0.04)
    t = jnp.asarray(TS, dtype=jnp.float64)
    for xx0, mm0 in [(0.0, sde.mm_0), (0.0, 0.0), (0.3, 0.7)]:
        got = sde._cov(xx0, mm0, t)
        want = oracle.cov(xx0, mm0, TS)
        for g, w, name in zip(got, want, "xx xm mm".split()):
            np.testing.assert_allclose(
                np.asarray(g), w, rtol=1e-9, atol=1e-13, err_msg=name
            )


@pytest.mark.parametrize("nu,gamma", PARAM_GRID)
def test_mean_matches_reference_oracle(nu, gamma):
    sde = make_sde(nu=nu, gamma=gamma)
    oracle = PSLDOracle(8.0, 8.0, nu, gamma, 0.04)
    t = jnp.asarray(TS, dtype=jnp.float64)
    got = sde.kernel_mean_coeff(t)
    want = oracle.mean_coeffs(TS)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-10, atol=1e-14)


@pytest.mark.parametrize("nu,gamma", PARAM_GRID)
def test_cov_spd(nu, gamma):
    """Covariance must be symmetric positive definite over the full t range."""
    sde = make_sde(nu=nu, gamma=gamma)
    t = jnp.asarray(TS, dtype=jnp.float64)
    xx, xm, mm = sde._cov(0.0, sde.mm_0, t)
    xx, xm, mm = map(np.asarray, (xx, xm, mm))
    assert (xx > 0).all()
    assert (mm > 0).all()
    assert (xx * mm - xm**2 > 0).all()


@pytest.mark.parametrize("decomp", ["lower", "upper"])
def test_coeff_factorization_roundtrip(decomp):
    """L L^T = Sigma and L^{-T} really is the inverse-transpose."""
    sde = make_sde(decomp=decomp)
    t = jnp.asarray(TS, dtype=jnp.float64)
    var = sde._cov(0.0, sde.mm_0, t)
    c11, c12, c21, c22 = (np.asarray(v) for v in sde.get_coeff(var))
    i11, i12, i21, i22 = (np.asarray(v) for v in sde.get_inv_coeff(var))
    xx, xm, mm = (np.asarray(v) for v in var)
    # reconstruction
    np.testing.assert_allclose(c11**2 + c12**2, xx, rtol=1e-9)
    np.testing.assert_allclose(c11 * c21 + c12 * c22, xm, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(c21**2 + c22**2, mm, rtol=1e-9)
    # L^T @ L^{-T} = I  (per 2x2): rows of L^T dot cols of inv
    lt = np.stack([np.stack([c11, c21], -1), np.stack([c12, c22], -1)], -2)
    li = np.stack([np.stack([i11, i12], -1), np.stack([i21, i22], -1)], -2)
    prod = np.einsum("...ij,...jk->...ik", lt, li)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(2), prod.shape),
                               atol=1e-7)


def test_score_times_factor_transpose_is_minus_eps():
    """get_score = -L^{-T} eps  ==>  L^T score = -eps."""
    sde = make_sde()
    key = jax.random.PRNGKey(1)
    eps = jax.random.normal(key, (4, 8, 8, 6), jnp.float32)
    t = jnp.asarray([0.1, 0.3, 0.5, 0.9], dtype=jnp.float64)
    score = sde.get_score(eps, 0.0, sde.mm_0, t)
    var = sde._cov(0.0, sde.mm_0, t)
    c11, c12, c21, c22 = sde.get_coeff(var)

    def bc(c):
        return np.asarray(c).reshape(-1, 1, 1, 1).astype(np.float32)

    s_x, s_m = (np.asarray(v) for v in split_xm(score))
    e_x, e_m = (np.asarray(v) for v in split_xm(eps))
    # L^T rows: [l11, l21], [l12(=0), l22]
    np.testing.assert_allclose(bc(c11) * s_x + bc(c21) * s_m, -e_x,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(bc(c12) * s_x + bc(c22) * s_m, -e_m,
                               rtol=1e-4, atol=1e-4)


def test_perturb_data_small_t_returns_input():
    """At t -> 0 the kernel collapses onto (x_0, m_0)."""
    sde = make_sde()
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (2, 4, 4, 3), jnp.float32)
    m0 = jnp.zeros_like(x0)
    eps = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 6), jnp.float32)
    t = jnp.full((2,), 1e-8, dtype=jnp.float64)
    z_t, mu_t, _ = sde.perturb_data(x0, m0, 0.0, 0.0, t, eps)
    np.testing.assert_allclose(np.asarray(mu_t)[..., :3], np.asarray(x0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_t), np.asarray(mu_t), atol=1e-3)


@pytest.mark.parametrize("mode,mm0", [("hsm", None), ("dsm", 0.0)])
def test_perturb_marginals_monte_carlo(mode, mm0):
    """Sampled z_t first/second moments match the analytic kernel."""
    sde = make_sde()
    n = 200_000
    key = jax.random.PRNGKey(4)
    x0 = jnp.full((n, 1, 1, 1), 0.7, dtype=jnp.float32)
    if mode == "hsm":
        m0 = jnp.zeros_like(x0)
        mm_0 = sde.mm_0
    else:
        m0 = np.sqrt(sde.mm_0) * jax.random.normal(key, x0.shape, jnp.float32)
        mm_0 = 0.0
    eps = jax.random.normal(jax.random.PRNGKey(5), (n, 1, 1, 2), jnp.float32)
    t = jnp.full((n,), 0.4, dtype=jnp.float64)
    z_t, mu_t, var = sde.perturb_data(x0, m0, 0.0, mm_0, t, eps)
    z = np.asarray(z_t).reshape(n, 2)
    # empirical mean vs analytic (HSM: m0 = 0 so mean is deterministic)
    e11, e12, e21, e22 = (float(np.asarray(c)[0]) for c in
                          sde.kernel_mean_coeff(t))
    np.testing.assert_allclose(z[:, 0].mean(), e11 * 0.7, atol=5e-3)
    np.testing.assert_allclose(z[:, 1].mean(), e21 * 0.7, atol=5e-3)
    # empirical covariance vs analytic kernel covariance (+ m0 spread for DSM)
    xx, xm, mm = (float(np.asarray(v)[0]) for v in var)
    if mode == "dsm":
        # m0 randomness adds e12^2 mm_0-ish terms; recompute via full cov
        xx_f, xm_f, mm_f = (float(np.asarray(v)[0]) for v in
                            sde._cov(0.0, sde.mm_0, t))
        xx, xm, mm = xx_f, xm_f, mm_f
    emp = np.cov(z.T)
    np.testing.assert_allclose(emp[0, 0], xx, rtol=2e-2)
    np.testing.assert_allclose(emp[0, 1], xm, rtol=4e-2, atol=2e-3)
    np.testing.assert_allclose(emp[1, 1], mm, rtol=2e-2)


def test_forward_em_matches_kernel_marginals():
    """Euler-Maruyama integration of the forward SDE reproduces the
    closed-form kernel moments (validates sde() against _mean/_cov)."""
    sde = make_sde()
    n, steps, t_end = 100_000, 400, 0.5
    key = jax.random.PRNGKey(6)
    x0 = jnp.full((n, 1, 1, 1), 1.0, dtype=jnp.float32)
    z = join_xm(x0, jnp.zeros_like(x0))
    dt = t_end / steps

    def step(carry, i):
        z, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((n,), i * dt, dtype=jnp.float64)
        f, g = sde.sde(z, t)
        noise = jax.random.normal(sub, z.shape, z.dtype)
        z = z + f * dt + g * float(np.sqrt(dt)) * noise
        return (z, key), None

    (z, _), _ = jax.lax.scan(step, (z, key), jnp.arange(steps))
    zf = np.asarray(z).reshape(n, 2)
    t = jnp.full((1,), t_end, dtype=jnp.float64)
    e11, _, e21, _ = (float(np.asarray(c)[0]) for c in sde.kernel_mean_coeff(t))
    xx, xm, mm = (float(np.asarray(v)[0]) for v in sde._cov(0.0, 0.0, t))
    np.testing.assert_allclose(zf[:, 0].mean(), e11, atol=2e-2)
    np.testing.assert_allclose(zf[:, 1].mean(), e21, atol=2e-2)
    emp = np.cov(zf.T)
    np.testing.assert_allclose(emp[0, 0], xx, rtol=6e-2, atol=5e-3)
    np.testing.assert_allclose(emp[1, 1], mm, rtol=6e-2, atol=5e-3)


def test_predict_x_from_eps_inverts_perturbation():
    sde = make_sde()
    x0 = jax.random.normal(jax.random.PRNGKey(7), (3, 2, 2, 3), jnp.float32)
    m0 = jnp.zeros_like(x0)
    eps = jax.random.normal(jax.random.PRNGKey(8), (3, 2, 2, 6), jnp.float32)
    t_scalar = 0.37
    t = jnp.full((3,), t_scalar, dtype=jnp.float64)
    z_t, _, _ = sde.perturb_data(x0, m0, 0.0, sde.mm_0, t, eps)
    x_rec, m_rec = sde.predict_x_from_eps(z_t, eps, jnp.float64(t_scalar))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_rec), np.asarray(m0), atol=1e-3)


def test_prior_sampling_moments():
    sde = make_sde()
    z = sde.prior_sampling(jax.random.PRNGKey(9), (50_000, 1, 1, 2))
    z = np.asarray(z)
    x, m = z[..., :2], z[..., 2:]
    np.testing.assert_allclose(x.std(), 1.0, rtol=2e-2)
    np.testing.assert_allclose(m.std(), np.sqrt(sde.m), rtol=2e-2)


def test_mode_property():
    assert make_sde(nu=4.0, gamma=0.0).mode == "score_m"
    assert make_sde(nu=0.0, gamma=2.0).mode == "score_x"
    assert make_sde(nu=4.01, gamma=0.01).mode == "score_xm"


def test_reverse_sde_zero_score_is_negated_drift():
    sde = make_sde()
    z = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 4, 6), jnp.float32)
    t = jnp.asarray([0.2, 0.6], dtype=jnp.float64)

    # score_fn returning zeros => score contribution vanishes
    def zero_score(z_in, t_in):
        return jnp.zeros_like(z_in)

    f_bar, g_bar = sde.reverse_sde(z, t, zero_score)
    f_fwd, g_fwd = sde.sde(z, sde.T - t)
    np.testing.assert_allclose(np.asarray(f_bar), -np.asarray(f_fwd), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_bar), np.asarray(g_fwd), atol=1e-6)


def test_get_score_reduced_modes():
    """score_m+lower zero-fills the x half; score_x+upper the m half."""
    sde_m = make_sde(nu=4.0, gamma=0.0, decomp="lower")
    eps3 = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 4, 3), jnp.float32)
    t = jnp.asarray([0.3, 0.5], dtype=jnp.float64)
    score = sde_m.get_score(eps3, 0.0, sde_m.mm_0, t)
    assert score.shape == (2, 4, 4, 6)
    assert np.asarray(score[..., :3]).max() == 0.0

    sde_x = make_sde(nu=0.0, gamma=2.0, decomp="upper")
    score = sde_x.get_score(eps3, 0.0, sde_x.mm_0, t)
    assert score.shape == (2, 4, 4, 6)
    assert np.asarray(score[..., 3:]).max() == 0.0


@pytest.mark.parametrize("nu,gamma", [(4.01, 0.01), (4.0, 0.0), (1.0, 2.0)])
def test_sscs_transition_matches_reference_oracle(nu, gamma):
    """SSCS analytical half-step mean/cov vs the reference's expanded tables
    (main/samplers/sde.py:236-292)."""
    from oracles import PSLDOracle

    sde = make_sde(nu=nu, gamma=gamma)
    oracle = PSLDOracle(8.0, 8.0, nu, gamma, 0.04)
    t_np = np.array([0.0, 0.1, 0.5, 0.9, 0.998])
    dt = 1e-3
    t = jnp.asarray(t_np, dtype=jnp.float64)
    (m11, m12, m21, m22), (xx, xm, mm) = sde.sscs_transition(t, dt)
    w11, w12, w21, w22 = oracle.sscs_mean_coeffs(t_np, dt)
    np.testing.assert_allclose(np.asarray(m11), w11, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m12), w12, rtol=1e-10, atol=1e-15)
    np.testing.assert_allclose(np.asarray(m21), w21, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m22), w22, rtol=1e-10)
    oxx, oxm, omm = oracle.sscs_var(t_np, dt)
    np.testing.assert_allclose(np.asarray(xx), oxx, rtol=1e-7, atol=1e-15)
    np.testing.assert_allclose(np.asarray(xm), oxm, rtol=1e-6, atol=1e-15)
    np.testing.assert_allclose(np.asarray(mm), omm, rtol=1e-7, atol=1e-15)
