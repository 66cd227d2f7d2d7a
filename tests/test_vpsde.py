"""VP-SDE baseline tests (reference main/models/sde/vpsde.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.config import ConfigDict
from psld_tpu.sde.vpsde import VPSDE


def make_sde(beta_min=0.1, beta_max=20.0):
    return VPSDE(
        ConfigDict(
            {
                "model": {
                    "sde": {
                        "beta_min": beta_min,
                        "beta_max": beta_max,
                        "n_timesteps": 1000,
                    }
                }
            }
        )
    )


def test_marginal_identities():
    sde = make_sde()
    t = jnp.asarray([1e-5, 0.1, 0.5, 1.0], dtype=jnp.float64)
    lm = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(
        np.asarray(sde._std(t)), np.sqrt(1 - np.exp(2 * np.asarray(lm))),
        rtol=1e-10,
    )
    x0 = jnp.ones((4, 2, 2, 1))
    mean, std = sde.cond_marginal_prob(x0, t)
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, 0], np.exp(np.asarray(lm)), rtol=1e-6
    )
    # variance preserved: mean^2 + std^2 = 1 for unit data
    total = np.asarray(mean)[:, 0, 0, 0] ** 2 + np.asarray(std)[:, 0, 0, 0] ** 2
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)


def test_forward_em_matches_marginals():
    sde = make_sde()
    n, steps, t_end = 100_000, 500, 0.6
    x = jnp.full((n, 1, 1, 1), 1.0, dtype=jnp.float32)
    dt = t_end / steps

    def step(carry, i):
        x, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((n,), i * dt, dtype=jnp.float64)
        f, g = sde.sde(x, t)
        x = x + f * dt + g * float(np.sqrt(dt)) * jax.random.normal(sub, x.shape, x.dtype)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, jax.random.PRNGKey(0)), jnp.arange(steps))
    xf = np.asarray(x).ravel()
    t = jnp.full((1,), t_end, dtype=jnp.float64)
    mean, std = sde.cond_marginal_prob(jnp.ones((1, 1, 1, 1)), t)
    np.testing.assert_allclose(xf.mean(), float(np.asarray(mean).ravel()[0]),
                               atol=2e-2)
    np.testing.assert_allclose(xf.std(), float(np.asarray(std).ravel()[0]),
                               rtol=3e-2)


def test_get_score_consistency():
    sde = make_sde()
    eps = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 2, 1), jnp.float32)
    t = jnp.asarray([0.2, 0.5, 0.9], dtype=jnp.float64)
    score = sde.get_score(eps, t)
    std = np.asarray(sde._std(t)).reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(score), -np.asarray(eps) / std,
                               rtol=1e-5)


def test_prior_logp_standard_normal():
    sde = make_sde()
    z = jnp.zeros((1, 2, 2, 1))
    lp = float(np.asarray(sde.prior_logp(z))[0])
    np.testing.assert_allclose(lp, -0.5 * 4 * np.log(2 * np.pi), rtol=1e-6)
