"""Probability-flow ODE samplers.

Two implementations with the reference's single ``bb_ode``'s capability
(main/samplers/ode.py:8-76):

* ``bb_ode`` -- black-box adaptive solve via ``scipy.integrate.solve_ivp``
  (the reference routes through torchdiffeq's ``scipy_solver`` to the same
  SciPy RK45). Each RHS evaluation calls a jitted drift on device; NFE is
  counted and ``mean_nfe`` reported, matching the reference's protocol. This
  is host-in-the-loop *by design* (adaptive control flow), kept for parity.
* ``rk_ode`` -- TPU-native fixed-grid Runge--Kutta (heun/rk4) compiled into a
  single ``lax.scan``: zero host sync, deterministic NFE = order * steps.
  This is the fast path for FID-at-low-NFE studies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.samplers.base import Sampler
from psld_tpu.utils.numerics import time_dtype


@register_module(category="samplers", name="bb_ode")
class BBODESampler(Sampler):
    """(reference samplers/ode.py:8-76)"""

    def __init__(self, config, sde, score_fn, corrector_fn=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        self.nfe = 0
        self._counter = 0
        self.rtol = float(config.evaluation.sampler.rtol)
        self.atol = float(config.evaluation.sampler.atol)
        self.solver = str(config.evaluation.sampler.get("solver", "RK45"))

        def drift(x, t):
            tv = jnp.full((x.shape[0],), t, dtype=time_dtype())
            f, _ = self.sde.reverse_sde(x, tv, self.score_fn,
                                        probability_flow=True)
            return f

        self._drift = jax.jit(drift)

    @property
    def n_steps(self) -> int:
        return self.nfe

    @property
    def mean_nfe(self) -> float:
        if self._counter == 0:
            raise ValueError("Run .sample() to compute mean_nfe")
        return self.nfe / self._counter

    def denoise_fn(self, x, t, dt):
        tv = jnp.full((x.shape[0],), t, dtype=time_dtype())
        f, _ = self.sde.reverse_sde(x, tv, self.score_fn,
                                    probability_flow=True)
        return x + f * jnp.asarray(dt).astype(x.dtype)

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        from scipy.integrate import solve_ivp

        del key, ts, n_discrete_steps
        x = batch
        shape, dtype = x.shape, x.dtype
        self._counter += 1

        def rhs(t, y):
            self.nfe += 1
            xt = jnp.asarray(y.reshape(shape), dtype)
            return np.asarray(self._drift(xt, t), np.float64).ravel()

        sol = solve_ivp(
            rhs,
            (0.0, self.sde.T - eps),
            np.asarray(x, np.float64).ravel(),
            method=self.solver,
            rtol=self.rtol,
            atol=self.atol,
        )
        x = jnp.asarray(sol.y[:, -1].reshape(shape), dtype)
        if denoise:
            x = self.denoise_fn(x, self.sde.T - eps, eps)
            self.nfe += 1
        return x


@register_module(category="samplers", name="rk_ode")
class RKODESampler(Sampler):
    """Fixed-grid on-device probability-flow integrator (TPU-native
    extension; heun = 2 NFE/step, rk4 = 4 NFE/step)."""

    def __init__(self, config, sde, score_fn, corrector_fn=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        self.method = str(config.evaluation.sampler.get("solver", "heun")).lower()
        assert self.method in ("euler", "heun", "rk4")

    def _drift(self, x, t):
        tv = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        f, _ = self.sde.reverse_sde(x, tv, self.score_fn,
                                    probability_flow=True)
        return f

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del key, n_discrete_steps
        x = batch

        def body(x, inp):
            t, t_next = inp
            dt = t_next - t
            dt_c = jnp.asarray(dt).astype(x.dtype)
            k1 = self._drift(x, t)
            if self.method == "euler":
                x = x + dt_c * k1
            elif self.method == "heun":
                k2 = self._drift(x + dt_c * k1, t_next)
                x = x + dt_c * 0.5 * (k1 + k2)
            else:  # rk4
                half = t + dt / 2
                k2 = self._drift(x + 0.5 * dt_c * k1, half)
                k3 = self._drift(x + 0.5 * dt_c * k2, half)
                k4 = self._drift(x + dt_c * k3, t_next)
                x = x + dt_c / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            return x, None

        x, _ = jax.lax.scan(body, x, (ts[:-1], ts[1:]))
        if denoise:
            dt_c = jnp.asarray(eps, ts.dtype)
            x = x + self._drift(x, jnp.asarray(self.sde.T - eps,
                                               ts.dtype)) * dt_c.astype(x.dtype)
        return x
