"""Variance-Preserving SDE baseline (reference main/models/sde/vpsde.py:8-99).

dx = -1/2 beta(t) x dt + sqrt(beta(t)) dW, with the standard closed-form
Gaussian perturbation kernel. Pure-functional, NHWC, explicit PRNG keys.

Note: the reference's ``perturb_data`` carries a latent bug
(``noise = torch.randn_like(x_0) if None else noise``, vpsde.py:32) that is
harmless because callers always pass noise; here ``eps`` is required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.sde.base import SDE
from psld_tpu.utils.numerics import bcast_right


@register_module(category="sde", name="vpsde")
class VPSDE(SDE):
    def __init__(self, config):
        super().__init__(config.model.sde.n_timesteps)
        self.beta_0 = float(config.model.sde.beta_min)
        self.beta_1 = float(config.model.sde.beta_max)

    def beta_t(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    @property
    def T(self) -> float:
        return 1.0

    @property
    def type(self) -> str:
        return "vpsde"

    @property
    def is_augmented(self) -> bool:
        return False

    def _log_mean_coeff(self, t):
        # vpsde.py:71-73
        return -0.25 * t * t * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def _std(self, t):
        return jnp.sqrt(-jnp.expm1(2.0 * self._log_mean_coeff(t)))

    def get_score(self, eps, t):
        std = bcast_right(self._std(t), eps.ndim).astype(eps.dtype)
        return -eps / std

    def cond_marginal_prob(self, x_0, t):
        mean_coeff = jnp.exp(self._log_mean_coeff(t))
        mean = bcast_right(mean_coeff, x_0.ndim).astype(x_0.dtype) * x_0
        std = bcast_right(self._std(t), x_0.ndim)
        return mean, std

    def perturb_data(self, x_0, t, eps):
        mean, std = self.cond_marginal_prob(x_0, t)
        return mean + eps * std.astype(eps.dtype)

    def sde(self, x_t, t):
        beta = bcast_right(self.beta_t(t), x_t.ndim).astype(x_t.dtype)
        return -0.5 * beta * x_t, jnp.sqrt(beta) * jnp.ones_like(x_t)

    def reverse_sde(self, x_t, t, score_fn, probability_flow=False):
        t = self.T - t
        f, g = self.sde(x_t, t)
        eps_pred = score_fn(x_t.astype(jnp.float32), t.astype(jnp.float32))
        score = self.get_score(eps_pred, t).astype(x_t.dtype)
        score = 0.5 * score if probability_flow else score
        f_bar = -f + g * g * score
        g_bar = jnp.zeros_like(g) if probability_flow else g
        return f_bar, g_bar

    def prior_sampling(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        reduce_axes = tuple(range(1, z.ndim))
        return -0.5 * n * np.log(2 * np.pi) - 0.5 * jnp.sum(z * z, axis=reduce_axes)

    def likelihood_weighting(self, t):
        return self.beta_t(t)
