"""Probability-flow likelihood tests against closed-form Gaussians.

With an exact score function the PF ODE is exact, so the computed log p
must match the analytic marginal density to RK discretization error. For
linear (Gaussian) drifts the Rademacher Hutchinson estimator is exact as
well (v^T (aI) v = a D for v in {-1,1}^D), giving tight tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.config import ConfigDict
from psld_tpu.eval.likelihood import (
    augmented_nll_bound,
    bits_per_dim,
    make_likelihood_fn,
)
from psld_tpu.sde.vpsde import VPSDE
from test_sde_psld import make_sde

EPS = 1e-5
SIGMA0 = 0.6


def make_vpsde():
    return VPSDE(ConfigDict({"model": {"sde": {
        "beta_min": 0.1, "beta_max": 20.0, "n_timesteps": 1000}}}))


def vpsde_gaussian_score_fn(sde, sigma0):
    """Exact eps-prediction for x0 ~ N(0, sigma0^2 I): the marginal at t is
    N(0, mc^2 sigma0^2 + std^2), score = -x / v, and get_score = -eps/std."""

    def score_fn(x, t):
        mc = jnp.exp(sde._log_mean_coeff(t))
        std = sde._std(t)
        v = mc * mc * sigma0**2 + std * std
        coef = (std / v).reshape((-1,) + (1,) * (x.ndim - 1))
        return coef.astype(x.dtype) * x

    return score_fn


def gauss_logp(x, var):
    d = np.prod(x.shape[1:])
    axes = tuple(range(1, x.ndim))
    return (-0.5 * d * np.log(2 * np.pi * var)
            - 0.5 * jnp.sum(x * x, axis=axes) / var)


def marginal_var_vpsde(sde, t, sigma0):
    mc = float(np.exp(sde._log_mean_coeff(t)))
    std2 = 1.0 - np.exp(2.0 * sde._log_mean_coeff(t))
    return mc * mc * sigma0**2 + std2


def test_vpsde_exact_gaussian_nll():
    sde = make_vpsde()
    fn = make_likelihood_fn(sde, vpsde_gaussian_score_fn(sde, SIGMA0),
                            n_steps=128, eps=EPS, method="rk4",
                            exact_div=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 1), jnp.float64) * SIGMA0
    out = jax.jit(fn)(key, x)
    want = gauss_logp(x, marginal_var_vpsde(sde, EPS, SIGMA0))
    np.testing.assert_allclose(np.asarray(out["logp"]), np.asarray(want),
                               rtol=0, atol=2e-3)
    # the terminal latent of a well-integrated PF ODE is unit-Gaussian-sized
    assert float(jnp.std(out["z_T"])) == pytest.approx(1.0, abs=0.35)


@pytest.mark.parametrize("steps_per_dispatch", [1, 5, 100])
def test_segmented_likelihood_bit_identical(steps_per_dispatch):
    """evaluation.likelihood.steps_per_dispatch: chaining the SAME scan
    body over host-sliced grid chunks (probes riding the carry) must
    reproduce the single-scan NLL — the likelihood analogue of the
    samplers' nfe_per_dispatch. On the CPU backend XLA unrolls
    short-trip-count scans and contracts FMAs differently inside the
    unrolled body (the same effect the ei_ode o3 test gates), leaving a
    1-2 ULP f64 residue — gated here at 1e-12 relative; the TPU backend
    compiles the chunked scans with identical rounding (on-chip
    `seg_identity` rows record likelihood bit-exactness,
    scripts/results_ei3_rows.jsonl)."""
    sde = make_vpsde()
    fn = make_likelihood_fn(sde, vpsde_gaussian_score_fn(sde, SIGMA0),
                            n_steps=16, eps=EPS, method="heun", n_probes=2)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 4, 4, 1), jnp.float64) * SIGMA0
    ref = jax.jit(fn)(key, x)

    ts = np.asarray(fn.segment_ts())
    xs_full = (ts[:-1], ts[1:])
    carry = jax.jit(fn.segment_init)(key, x)
    seg = jax.jit(lambda c, ch: jax.lax.scan(fn.segment_body, c, ch)[0])
    for i in range(0, ts.shape[0] - 1, steps_per_dispatch):
        chunk = tuple(a[i:i + steps_per_dispatch] for a in xs_full)
        carry = seg(carry, chunk)
    out = jax.jit(fn.segment_finalize)(carry)
    for k in ("logp", "prior_logp", "delta_logp", "z_T"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-12, atol=1e-12, err_msg=k)


def test_evaluate_nll_steps_per_dispatch_matches(tmp_path):
    """The evaluate_nll entry point honors
    evaluation.likelihood.steps_per_dispatch and returns the SAME
    bits/dim as the single-scan path (same seeds, same probes)."""
    import glob

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.eval.likelihood import evaluate_nll
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    argv = [
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        f"dataset.diffusion.training.results_dir={results}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=4",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
    ]
    train_sde(compose(argv).dataset.diffusion, max_steps=2)
    ckpt_path = [c for c in glob.glob(f"{results}/checkpoints/psld-*")
                 if not c.endswith(".meta.json")][0]

    vals = {}
    for tag, extra in (("whole", []),
                       ("seg", ["+dataset.diffusion.evaluation."
                                "likelihood.steps_per_dispatch=3"])):
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            "+dataset.diffusion.evaluation.likelihood.n_steps=8",
            "+dataset.diffusion.evaluation.likelihood.solver=heun",
            "dataset.diffusion.evaluation.batch_size=2",
            "dataset.diffusion.evaluation.n_samples=2",
        ] + extra)
        vals[tag] = evaluate_nll(cfg.dataset.diffusion, max_batches=1)
    assert vals["seg"] == pytest.approx(vals["whole"], rel=0, abs=1e-9)


def test_hutchinson_matches_exact_for_linear_drift():
    sde = make_vpsde()
    score = vpsde_gaussian_score_fn(sde, SIGMA0)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 4, 4, 1), jnp.float64) * SIGMA0
    exact = make_likelihood_fn(sde, score, n_steps=32, eps=EPS,
                               method="heun", exact_div=True)(key, x)
    hutch = make_likelihood_fn(sde, score, n_steps=32, eps=EPS,
                               method="heun", n_probes=1)(key, x)
    np.testing.assert_allclose(np.asarray(hutch["logp"]),
                               np.asarray(exact["logp"]), rtol=0, atol=1e-8)
    assert int(hutch["nfe"]) == 64


def test_divergence_estimators_work_through_custom_vjp():
    """A learned NCSN++ score routes through the Pallas attention's
    custom_vjp, which REJECTS forward-mode autodiff — both divergence
    estimators must therefore run in reverse mode (regression: the first
    learned-model NLL run crashed with 'can't apply jvp to a custom_vjp
    function', round 3)."""
    from psld_tpu.eval.likelihood import (_divergence_exact,
                                          _divergence_hutchinson)

    @jax.custom_vjp
    def f(z):
        return jnp.tanh(z) * 2.0

    def f_fwd(z):
        return f(z), z

    def f_bwd(z, g):
        return (g * 2.0 * (1.0 - jnp.tanh(z) ** 2),)

    f.defvjp(f_fwd, f_bwd)

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2), jnp.float64)
    # exact divergence of elementwise tanh*2: sum of 2*(1 - tanh^2)
    want = np.sum(2.0 * (1.0 - np.tanh(np.asarray(z)) ** 2), axis=(1, 2, 3))
    got = np.asarray(_divergence_exact(f, z))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # chunked trace rows (incl. a ragged 32 % 5 chunk and fully serial)
    # must agree bit-for-bit in structure with the one-shot path
    for chunk in (5, 1):
        np.testing.assert_allclose(
            np.asarray(_divergence_exact(f, z, row_chunk=chunk)), want,
            rtol=1e-10)

    probes = jnp.asarray(
        2.0 * jax.random.bernoulli(
            jax.random.PRNGKey(1), 0.5, (8,) + z.shape) - 1.0, z.dtype)
    hutch = np.asarray(_divergence_hutchinson(f, z, probes))
    # elementwise (diagonal) Jacobian -> Rademacher Hutchinson is exact
    np.testing.assert_allclose(hutch, want, rtol=1e-10)


def psld_gaussian_score_fn(sde, sigma0):
    """Exact eps-prediction for z0 = (x0, m0), x0 ~ N(0, sigma0^2),
    m0 ~ N(0, mm_0): marginal cov S_t from the kernel with xx_0 = sigma0^2;
    the net must output eps = -Lhat(t)^T score with Lhat the factor of the
    TRAINING kernel cov (xx_0 = 0), since get_score = -Lhat^{-T} eps
    (psld.py:230-260)."""
    from psld_tpu.sde.psld import join_xm, split_xm

    def score_fn(z, t):
        xx, xm, mm = sde._cov(sigma0**2, sde.mm_0, t)
        det = xx * mm - xm * xm
        x, m = split_xm(z)

        def c(v):
            return v.reshape((-1,) + (1,) * (x.ndim - 1)).astype(z.dtype)

        # score = -S_t^{-1} z, per-pixel 2x2 solve
        s_x = -(c(mm) * x - c(xm) * m) / c(det)
        s_m = -(-c(xm) * x + c(xx) * m) / c(det)
        l11, l12, l21, l22 = sde.get_coeff(sde._cov(0.0, sde.mm_0, t))
        # eps = -Lhat^T score
        e_x = -(c(l11) * s_x + c(l21) * s_m)
        e_m = -(c(l12) * s_x + c(l22) * s_m)
        return join_xm(e_x, e_m)

    return score_fn


def psld_joint_logp(sde, z, t, sigma0):
    from psld_tpu.sde.psld import split_xm

    xx, xm, mm = (float(np.asarray(v)[0]) for v in
                  sde._cov(sigma0**2, sde.mm_0, jnp.asarray([t])))
    det = xx * mm - xm * xm
    x, m = split_xm(z)
    d = np.prod(x.shape[1:])
    axes = tuple(range(1, x.ndim))
    quad = (mm * jnp.sum(x * x, axis=axes)
            - 2 * xm * jnp.sum(x * m, axis=axes)
            + xx * jnp.sum(m * m, axis=axes)) / det
    return -d * np.log(2 * np.pi) - 0.5 * d * np.log(det) - 0.5 * quad


def test_psld_joint_exact_gaussian_nll():
    sde = make_sde(nu=4.01, gamma=0.01)
    score = psld_gaussian_score_fn(sde, SIGMA0)
    key = jax.random.PRNGKey(2)
    kx, km = jax.random.split(key)
    x = jax.random.normal(kx, (6, 4, 4, 1), jnp.float64) * SIGMA0
    m = jax.random.normal(km, (6, 4, 4, 1), jnp.float64) * np.sqrt(sde.mm_0)
    z = jnp.concatenate([x, m], axis=-1)
    fn = make_likelihood_fn(sde, score, n_steps=128, eps=EPS, method="rk4",
                            exact_div=True)
    out = jax.jit(fn)(key, z)
    want = psld_joint_logp(sde, z, EPS, SIGMA0)
    np.testing.assert_allclose(np.asarray(out["logp"]), np.asarray(want),
                               rtol=0, atol=1e-3)


def test_augmented_bound_tight_for_independent_momentum():
    """At t=0 the true p(m|x) IS q(m) = N(0, mm_0), so the variational
    bound equals the exact marginal NLL of x IN EXPECTATION over the
    momentum draw (single-draw std is ~2.5 nats at this size, so we
    average 12 draws; sampling std of the pooled mean is ~0.3)."""
    sde = make_sde(nu=4.01, gamma=0.01)
    score = psld_gaussian_score_fn(sde, SIGMA0)
    fn = make_likelihood_fn(sde, score, n_steps=64, eps=EPS, method="rk4",
                            exact_div=True)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (6, 4, 4, 1), jnp.float64) * SIGMA0
    bound_fn = jax.jit(lambda k: augmented_nll_bound(sde, fn, k, x)[0])
    got = np.stack([np.asarray(bound_fn(jax.random.fold_in(key, i)))
                    for i in range(12)])
    xx, _, _ = sde._cov(SIGMA0**2, sde.mm_0, jnp.asarray([EPS]))
    want = -gauss_logp(x, float(np.asarray(xx)[0]))
    np.testing.assert_allclose(got.mean(), np.asarray(want).mean(),
                               rtol=0, atol=1.0)


def test_bits_per_dim_uniform_reference():
    # density 1/2 per dim on [-1,1] (i.e. 8-bit uniform data) -> 8 bits/dim
    d = 3072
    nll = jnp.asarray([d * np.log(2.0)])
    np.testing.assert_allclose(np.asarray(bits_per_dim(nll, d)), [8.0])
