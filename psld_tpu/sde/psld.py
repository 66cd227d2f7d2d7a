"""Phase-Space Langevin Diffusion (PSLD) SDE.

TPU-native reimplementation of the reference PSLD math
(main/models/sde/psld.py:12-377), derived independently from the matrix
exponential of the critically-damped phase-space system rather than the
reference's expanded per-coefficient tables.

Math
----
State ``z = (x, m)``. Forward SDE (reference psld.py:330-343)::

    dz = 1/2 beta(t) A z dt + sqrt(beta(t)) G dW
    A  = [[-gamma, 1/M], [-1, -nu]],   G = diag(sqrt(gamma), sqrt(M nu))

with ``1/M = (gamma - nu)^2 / 4``. Because ``gamma nu + 1/M =
((gamma+nu)/2)^2``, A has the double eigenvalue ``-(gamma+nu)/2`` and
``N := A + (gamma+nu)/2 I`` is nilpotent, so with the time change
``s = b(t) = int_0^t beta``::

    E(s) := exp(A s / 2) = e^{-lam s} (I + s N / 2),   lam = (gamma+nu)/4

The perturbation kernel is Gaussian with

    mean(s)  = E(s) z_0
    cov(s)   = E(s) Sigma_0 E(s)^T + D I0 + S I1 + Q I2

where ``D = diag(gamma, M nu)`` (diffusion per unit s), ``S = (N D + D N^T)/2``,
``Q = N D N^T / 4`` and ``Ik = int_0^s u^k e^{-2 lam u} du`` are the
cancellation-safe integrals of :func:`psld_tpu.utils.numerics.ou_weight_integrals`.
This evaluates identically to the reference's A/C/D coefficient tables
(psld.py:62-152) -- verified against a transcribed oracle in
tests/test_sde_psld.py -- while staying accurate in float32 and trivially
correct for negative ``s`` (needed by the SSCS half-steps).

Layout: NHWC; the phase-space state concatenates x and m on the trailing
channel axis (the reference uses NCHW dim=1, psld.py:82).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.sde.base import SDE
from psld_tpu.utils.debug import check_finite
from psld_tpu.utils.numerics import bcast_right, ou_weight_integrals, time_dtype


def split_xm(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a phase-space tensor into (x, m) halves on the channel axis."""
    return jnp.split(z, 2, axis=-1)


def join_xm(x: jax.Array, m: jax.Array) -> jax.Array:
    return jnp.concatenate([x, m], axis=-1)


@register_module(category="sde", name="psld")
class PSLD(SDE):
    def __init__(self, config):
        super().__init__(config.model.sde.n_timesteps)
        sde_cfg = config.model.sde
        self.beta_0 = float(sde_cfg.beta_min)
        self.beta_1 = float(sde_cfg.beta_max)
        self.nu = float(sde_cfg.nu)
        self.gamma = float(sde_cfg.gamma)
        assert self.nu != 0 or self.gamma != 0
        # reference psld.py:25-26
        self.m_inv = (self.gamma - self.nu) ** 2 / 4.0
        self.m = 1.0 / self.m_inv
        self.kappa = float(sde_cfg.kappa)
        self.mm_0 = self.kappa * self.m
        self.eps = float(sde_cfg.numerical_eps)
        self.decomp_mode = str(sde_cfg.decomp_mode)
        assert self.decomp_mode in ("lower", "upper")

        # derived constants of the nilpotent split (see module docstring)
        self._lam = (self.gamma + self.nu) / 4.0
        self._a = (self.nu - self.gamma) / 4.0  # (N/2)[0,0]
        self._b = self.m_inv / 2.0              # (N/2)[0,1]
        self._c = -0.5                          # (N/2)[1,0]
        self._dx = self.gamma                   # D[0,0]
        self._dm = self.m * self.nu             # D[1,1]

    def __repr__(self):
        return (
            f"PSLD(m_inv={self.m_inv}, gamma={self.gamma}, nu={self.nu}, "
            f"decomp={self.decomp_mode})"
        )

    # -- schedule ------------------------------------------------------------
    def beta_t(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def b_t(self, t):
        return self.beta_0 * t + 0.5 * (t * t) * (self.beta_1 - self.beta_0)

    @property
    def T(self) -> float:
        return 1.0

    @property
    def mode(self) -> str:
        # reference psld.py:50-56
        if self.gamma == 0:
            return "score_m"
        if self.nu == 0:
            return "score_x"
        return "score_xm"

    @property
    def type(self) -> str:
        return f"psld-{self.mode}"

    @property
    def is_augmented(self) -> bool:
        return True

    # -- matrix exponential pieces --------------------------------------------
    def _exp_half_As(self, s):
        """Entries of E(s) = exp(A s / 2) as per-batch scalars."""
        decay = jnp.exp(-self._lam * s)
        e11 = decay * (1.0 + self._a * s)
        e12 = decay * (self._b * s)
        e21 = decay * (self._c * s)
        e22 = decay * (1.0 - self._a * s)
        return e11, e12, e21, e22

    def kernel_mean_coeff(self, t):
        """Perturbation-kernel mean map coefficients at time t (shape [B] each)."""
        return self._exp_half_As(self.b_t(t))

    def _mean(self, x_0, m_0, t):
        """Kernel mean (reference psld.py:62-84), NHWC with t shape [B].

        Coefficients are computed in the time dtype (f64 under x64) but
        cast to x_0.dtype at the tensor edge -- otherwise the multiply
        promotes the whole NHWC tensor to software-emulated f64 on TPU.
        """
        e11, e12, e21, e22 = self.kernel_mean_coeff(t)
        nd = x_0.ndim

        def c(v):
            return bcast_right(v, nd).astype(x_0.dtype)

        mu_x = c(e11) * x_0 + c(e12) * m_0
        mu_m = c(e21) * x_0 + c(e22) * m_0
        return join_xm(mu_x, mu_m)

    def _cov_inhom(self, s):
        """Driven part of the kernel covariance: D I0 + S I1 + Q I2."""
        a, b, c = self._a, self._b, self._c
        dx, dm = self._dx, self._dm
        i0, i1, i2 = ou_weight_integrals(2.0 * self._lam, s)
        s_xx, s_xm, s_mm = 2.0 * a * dx, b * dm + c * dx, -2.0 * a * dm
        q_xx = a * a * dx + b * b * dm
        q_xm = a * c * dx - a * b * dm
        q_mm = c * c * dx + a * a * dm
        xx = dx * i0 + s_xx * i1 + q_xx * i2
        xm = s_xm * i1 + q_xm * i2
        mm = dm * i0 + s_mm * i1 + q_mm * i2
        return xx, xm, mm

    def _cov_from_s(self, xx_0, mm_0, s):
        """Kernel covariance entries (xx, xm, mm) given s = b(t) (shape [B])."""
        # homogeneous part: E diag(xx_0, mm_0) E^T -- pure products, no
        # cancellation (cf. reference psld.py:121-147 expanded form)
        e11, e12, e21, e22 = self._exp_half_As(s)
        xx_h = e11 * e11 * xx_0 + e12 * e12 * mm_0
        xm_h = e11 * e21 * xx_0 + e12 * e22 * mm_0
        mm_h = e21 * e21 * xx_0 + e22 * e22 * mm_0
        xx, xm, mm = self._cov_inhom(s)
        # eps guard: reference psld.py:152
        return xx_h + xx + self.eps, xm_h + xm, mm_h + mm + self.eps

    def sscs_transition(self, t, dt):
        """Mean map and covariance of the reverse-time *linear* sub-flow over
        [t, t+dt] in sampler time (SSCS analytical half-step; reference
        main/samplers/sde.py:236-292).

        Subtracting the score-Euler sub-step's linear terms
        (sde.py:314-329) from the reverse drift leaves
        ``dz/dtau = 1/2 beta(T-tau) Abar z`` with ``Abar = [[-gamma, -1/M],
        [1, -nu]]`` -- A with the skew part negated, same double eigenvalue.
        Its nilpotent ``Nbar`` is N with off-diagonal signs flipped, so the
        solution reuses the forward integrals with ``s = b(T-t) - b(T-(t+dt))
        > 0`` and the xm entries negated. Verified against the reference's
        expanded tables in tests/test_sde_psld.py.
        """
        s = self.b_t(self.T - t) - self.b_t(self.T - (t + dt))
        decay = jnp.exp(-self._lam * s)
        m11 = decay * (1.0 + self._a * s)
        m12 = -decay * (self._b * s)
        m21 = -decay * (self._c * s)
        m22 = decay * (1.0 - self._a * s)
        xx, xm, mm = self._cov_inhom(s)
        return (m11, m12, m21, m22), (xx + self.eps, -xm, mm + self.eps)

    def _cov(self, xx_0, mm_0, t):
        return self._cov_from_s(xx_0, mm_0, self.b_t(t))

    # -- covariance factorization ---------------------------------------------
    def get_coeff(self, var):
        """Triangular factor of the 2x2 kernel covariance (psld.py:154-186).

        lower: Cholesky L with Sigma = L L^T; upper: U with Sigma = U U^T.
        Returns (c11, c12, c21, c22) per-batch scalars. With
        PSLD_DEBUG_NUMERICS=1 the factors carry the reference's NaN guards
        (psld.py:167-171, 180-185) as compiled checkify checks.
        """
        xx, xm, mm = var
        if self.decomp_mode == "lower":
            l11 = jnp.sqrt(xx)
            l21 = xm / l11
            l22 = jnp.sqrt(mm - l21 * l21)
            check_finite("PSLD.get_coeff (lower)", l11, l21, l22)
            return l11, jnp.zeros_like(l11), l21, l22
        u22 = jnp.sqrt(mm)
        u12 = xm / u22
        u11 = jnp.sqrt(xx - u12 * u12)
        check_finite("PSLD.get_coeff (upper)", u11, u12, u22)
        return u11, u12, jnp.zeros_like(u22), u22

    def get_inv_coeff(self, var):
        """Inverse-transpose of the factor (psld.py:188-220); NaN guards
        (psld.py:200-205, 214-219) compiled in under PSLD_DEBUG_NUMERICS=1."""
        xx, xm, mm = var
        det = xx * mm - xm * xm
        if self.decomp_mode == "lower":
            li11 = jax.lax.rsqrt(xx)
            li12 = -xm / (jnp.sqrt(xx) * jnp.sqrt(det))
            li22 = jnp.sqrt(xx / det)
            check_finite("PSLD.get_inv_coeff (lower)", li11, li12, li22)
            return li11, li12, jnp.zeros_like(li11), li22
        ui22 = jax.lax.rsqrt(mm)
        ui21 = -xm / (jnp.sqrt(mm) * jnp.sqrt(det))
        ui11 = jnp.sqrt(mm / det)
        check_finite("PSLD.get_inv_coeff (upper)", ui11, ui21, ui22)
        return ui11, jnp.zeros_like(ui11), ui21, ui22

    def cond_marginal_prob(self, x_0, m_0, xx_0, mm_0, t):
        """Mean and 2x2 covariance of the kernel (psld.py:222-228)."""
        return self._mean(x_0, m_0, t), self._cov(xx_0, mm_0, t)

    # -- score ---------------------------------------------------------------
    def get_score(self, eps, xx_0, mm_0, t):
        """score = -(L^-T) eps, zero-filling the unused half in the
        reduced-output modes (psld.py:230-260). ``eps`` is the network output
        in float32; coefficients are broadcast-cast to eps.dtype at the edge.
        """
        var = self._cov(xx_0, mm_0, t)
        c11, c12, c21, c22 = self.get_inv_coeff(var)
        nd = eps.ndim

        def coef(c):
            return bcast_right(c, nd).astype(eps.dtype)

        if self.decomp_mode == "lower" and self.mode == "score_m":
            return join_xm(jnp.zeros_like(eps), -coef(c22) * eps)
        if self.decomp_mode == "upper" and self.mode == "score_x":
            return join_xm(-coef(c11) * eps, jnp.zeros_like(eps))
        eps_x, eps_m = split_xm(eps)
        score_x = -coef(c11) * eps_x - coef(c12) * eps_m
        score_m = -coef(c21) * eps_x - coef(c22) * eps_m
        return join_xm(score_x, score_m)

    # -- forward perturbation --------------------------------------------------
    def perturb_data(self, x_0, m_0, xx_0, mm_0, t, eps):
        """z_t = mean + L eps (psld.py:262-287). ``eps`` has 2C channels."""
        mu_t, var = self.cond_marginal_prob(x_0, m_0, xx_0, mm_0, t)
        c11, c12, c21, c22 = self.get_coeff(var)
        eps_x, eps_m = split_xm(eps)
        nd = eps_x.ndim

        def coef(c):
            return bcast_right(c, nd).astype(eps.dtype)

        noise_x = coef(c11) * eps_x + coef(c12) * eps_m
        noise_m = coef(c21) * eps_x + coef(c22) * eps_m
        z_t = mu_t.astype(eps.dtype) + join_xm(noise_x, noise_m)
        return z_t, mu_t, var

    def predict_x_from_eps(self, z_t, eps, t):
        """Invert the kernel mean map (psld.py:289-328; t is a scalar)."""
        var = self._cov(0.0, self.mm_0, t)
        l11, l12, l21, l22 = self.get_coeff(var)
        eps_x, eps_m = split_xm(eps)
        mu_x = split_xm(z_t)[0] - (l11 * eps_x + l12 * eps_m)
        mu_m = split_xm(z_t)[1] - (l21 * eps_x + l22 * eps_m)
        # invert mean map: z0 = E(s)^{-1} mu = e^{lam s}(I - s N/2) mu
        s = self.b_t(t)
        grow = jnp.exp(self._lam * s)
        x0 = grow * ((1.0 - self._a * s) * mu_x - self._b * s * mu_m)
        m0 = grow * (-self._c * s * mu_x + (1.0 + self._a * s) * mu_m)
        return x0, m0

    # -- dynamics ---------------------------------------------------------------
    def sde(self, z_t, t):
        """Forward drift/diffusion (psld.py:330-343); t shape [B]."""
        x_t, m_t = split_xm(z_t)
        beta = bcast_right(self.beta_t(t), x_t.ndim).astype(z_t.dtype)
        drift_x = 0.5 * beta * (self.m_inv * m_t - self.gamma * x_t)
        drift_m = 0.5 * beta * (-self.nu * m_t - x_t)
        diff_x = jnp.sqrt(beta * self.gamma) * jnp.ones_like(x_t)
        diff_m = jnp.sqrt(beta * self.m * self.nu) * jnp.ones_like(m_t)
        return join_xm(drift_x, drift_m), join_xm(diff_x, diff_m)

    def reverse_sde(self, z_t, t, score_fn, probability_flow=False):
        """Reverse drift/diffusion; t measured from 0 at the prior end
        (psld.py:345-364). ``score_fn(z, t)`` predicts eps in float32.
        """
        t = self.T - t
        f, g = self.sde(z_t, t)
        eps_pred = score_fn(z_t.astype(jnp.float32), t.astype(jnp.float32))
        score = self.get_score(eps_pred, 0.0, self.mm_0, t).astype(z_t.dtype)
        score = 0.5 * score if probability_flow else score
        f_bar = -f + g * g * score
        g_bar = jnp.zeros_like(g) if probability_flow else g
        return f_bar, g_bar

    # -- prior ---------------------------------------------------------------
    def prior_sampling(self, key, shape, dtype=jnp.float32):
        """x ~ N(0, I), m ~ N(0, M I) (psld.py:366-370). ``shape`` is the
        x-shape (..., C); output doubles the trailing channel axis."""
        kx, km = jax.random.split(key)
        p_x = jax.random.normal(kx, shape, dtype)
        p_m = jax.random.normal(km, shape, dtype) * float(np.sqrt(self.m))
        return join_xm(p_x, p_m)

    def prior_logp(self, z):
        """log N(x; 0, I) + log N(m; 0, M I).

        The reference leaves this unimplemented (psld.py:372-373); provided
        here for likelihood evaluation parity with VPSDE.
        """
        x, m = split_xm(z)
        n = np.prod(x.shape[1:])
        reduce_axes = tuple(range(1, x.ndim))
        logp_x = -0.5 * n * np.log(2 * np.pi) - 0.5 * jnp.sum(
            x * x, axis=reduce_axes
        )
        logp_m = (
            -0.5 * n * np.log(2 * np.pi * self.m)
            - 0.5 * self.m_inv * jnp.sum(m * m, axis=reduce_axes)
        )
        return logp_x + logp_m

    def likelihood_weighting(self, t):
        beta = self.beta_t(t)
        return beta * self.gamma, beta * self.m * self.nu

    # -- convenience for samplers ----------------------------------------------
    def timestep_vector(self, t, batch: int):
        """Broadcast a scalar time to a per-batch vector in the time dtype."""
        return jnp.full((batch,), t, dtype=time_dtype())
