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
* ``adaptive_ode`` -- TPU-native adaptive Dormand--Prince RK45 (the same
  5(4) pair and step-size controller as SciPy's ``RK45``) compiled into a
  single ``lax.while_loop``: the reference's adaptive capability with zero
  host sync per step. NFE is carried on device and reported per batch.
* ``ei_ode`` -- exponential-integrator solver exploiting the SDE's linear
  structure (DPM-Solver generalized to the PSLD 2x2 phase-space system):
  exact linear transport + quadrature-exact eps coefficients, second-order
  multistep at 1 NFE/step. The low-NFE deterministic operating point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.samplers.base import Sampler
from psld_tpu.sde.psld import join_xm, split_xm
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


# Dormand--Prince 5(4) tableau (the classic RK45 pair; FSAL: the 7th stage
# equals the first stage of the next step). E = b5 - b4 gives the embedded
# error estimate directly.
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = np.zeros((7, 7))
_DP_A[1, :1] = [1 / 5]
_DP_A[2, :2] = [3 / 40, 9 / 40]
_DP_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_DP_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_DP_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176,
                -5103 / 18656]
_DP_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_DP_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                   11 / 84, 0.0])
_DP_E = np.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
                  22 / 525, -1 / 40])


@register_module(category="samplers", name="adaptive_ode")
class AdaptiveODESampler(Sampler):
    """On-device adaptive probability-flow ODE solve (TPU-native extension).

    Same capability as ``bb_ode`` (reference samplers/ode.py:8-76) without
    the host-bound SciPy loop: Dormand--Prince 5(4) with SciPy's RK45
    error norm (RMS of err / (atol + rtol * max(|y|, |y_new|))) and step
    controller (safety 0.9, factor clipped to [0.2, 10]), compiled into one
    ``lax.while_loop``. The seven stages run through a ``lax.scan`` over the
    Butcher tableau so the program contains a SINGLE network instance
    (compile time stays flat vs the 97M-param U-Net). Fully jittable;
    ``sample_with_nfe`` additionally returns the on-device NFE counter.
    """

    MAX_FACTOR = 10.0
    MIN_FACTOR = 0.2
    SAFETY = 0.9

    def __init__(self, config, sde, score_fn, corrector_fn=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        scfg = config.evaluation.sampler
        self.rtol = float(scfg.rtol)
        self.atol = float(scfg.atol)
        self.max_steps = int(scfg.get("max_steps", 100_000))
        solver = str(scfg.get("solver", "RK45"))
        assert solver in ("RK45", "dopri5"), solver
        self.nfe = 0
        self._counter = 0

    @property
    def mean_nfe(self) -> float:
        if self._counter == 0:
            raise ValueError("Run .sample() to compute mean_nfe")
        return self.nfe / self._counter

    def _drift(self, x, t):
        tv = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        f, _ = self.sde.reverse_sde(x, tv, self.score_fn,
                                    probability_flow=True)
        return f

    def _error_norm(self, err, y_old, y_new):
        scale = self.atol + self.rtol * jnp.maximum(jnp.abs(y_old),
                                                    jnp.abs(y_new))
        norm = jnp.sqrt(jnp.mean(jnp.square(err / scale)))
        # a NaN state (diverged trajectory) must read as "reject, shrink"
        # rather than poisoning the step size into an infinite loop
        return jnp.where(jnp.isnan(norm), jnp.inf, norm)

    def _initial_step(self, y0, f0, t0, t_end):
        """SciPy's ``_select_initial_step`` heuristic (order p=4): costs one
        extra drift evaluation, keeps NFE comparable with the reference."""
        tdt = t0.dtype

        def rms(v):
            return jnp.sqrt(jnp.mean(jnp.square(v))).astype(tdt)

        scale = self.atol + self.rtol * jnp.abs(y0)
        d0 = rms(y0 / scale)
        d1 = rms(f0 / scale)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        # clamp the probe INSIDE the integration interval: the score (and
        # hence the drift) diverges at the t_phys -> 0 endpoint, and an
        # overshooting probe would poison the step size with NaN
        h0 = jnp.minimum(h0, 0.5 * (t_end - t0))
        y1 = y0 + h0.astype(y0.dtype) * f0
        f1 = self._drift(y1, t0 + h0)
        d2 = rms((f1 - f0) / scale) / h0
        h1 = jnp.where(
            jnp.maximum(d1, d2) <= 1e-15,
            jnp.maximum(jnp.asarray(1e-6, tdt), h0 * 1e-3),
            (0.01 / jnp.maximum(d1, d2)) ** 0.2,
        )
        h = jnp.minimum(jnp.minimum(100 * h0, h1), t_end - t0)
        # a non-finite probe (diverged f1) must not stall the solve
        return jnp.where(jnp.isfinite(h), h, (t_end - t0) * 1e-3)

    # -- bounded-dispatch protocol (the adaptive analogue of the fixed-grid
    # samplers' ``nfe_per_dispatch`` segmentation): the while_loop carry
    # (y, k1, t, h, nfe, steps) is a pytree the host can chain, and
    # ``adaptive_run`` caps the trip count per dispatch. Chaining dispatches
    # applies the IDENTICAL body the same number of times in the same order
    # as the unbounded loop, so trajectories match bit for bit
    # (tests/test_samplers.py::test_adaptive_segmented_identity); only the
    # dispatch boundaries — and hence the per-dispatch wall-clock the
    # tunneled runtime's ~60 s watchdog sees — move. One while iteration
    # costs 6 NFE (7 stages, FSAL reuses the first).
    NFE_PER_ITER = 6

    def adaptive_init(self, batch, eps=1e-3):
        """Initial carry: f0 evaluation + SciPy's initial-step heuristic
        (2 NFE)."""
        y = batch
        tdt = time_dtype()
        t0 = jnp.asarray(0.0, tdt)
        t_end = jnp.asarray(self.sde.T - eps, tdt)
        f0 = self._drift(y, t0)
        h = self._initial_step(y, f0, t0, t_end)
        return (y, f0, t0, h, jnp.asarray(2, jnp.int32),
                jnp.asarray(0, jnp.int32))

    def adaptive_run(self, carry, eps=1e-3, max_iters: int = 0):
        """Advance the solve by at most ``max_iters`` controller iterations
        (0 = the full ``max_steps`` budget in one dispatch)."""
        tdt = time_dtype()
        a = jnp.asarray(_DP_A, tdt)
        c = jnp.asarray(_DP_C, tdt)
        b5 = jnp.asarray(_DP_B5, tdt)
        e = jnp.asarray(_DP_E, tdt)
        t_end = jnp.asarray(self.sde.T - eps, tdt)
        steps_in = carry[5]
        cap = jnp.minimum(
            jnp.asarray(self.max_steps, jnp.int32),
            steps_in + max_iters if max_iters > 0
            else jnp.asarray(self.max_steps, jnp.int32))

        def cond(carry):
            y, k1, t, h, nfe, steps = carry
            return (t < t_end) & (steps < cap)

        def body(carry):
            y, k1, t, h, nfe, steps = carry
            h_c = jnp.minimum(h, t_end - t)

            ks0 = jnp.zeros((7,) + y.shape, y.dtype).at[0].set(k1)

            def stage(ks, inp):
                i, a_row, c_i = inp
                dy = jnp.tensordot(a_row.astype(y.dtype), ks, axes=1)
                yi = y + h_c.astype(y.dtype) * dy
                fi = self._drift(yi, t + c_i * h_c)
                return ks.at[i].set(fi), None

            idx = jnp.arange(1, 7)
            ks, _ = jax.lax.scan(stage, ks0, (idx, a[1:], c[1:]))

            y_new = y + h_c.astype(y.dtype) * jnp.tensordot(
                b5.astype(y.dtype), ks, axes=1)
            err = h_c.astype(y.dtype) * jnp.tensordot(
                e.astype(y.dtype), ks, axes=1)
            norm = self._error_norm(err, y, y_new)

            accept = norm <= 1.0
            raw = self.SAFETY * norm ** -0.2
            factor = jnp.where(
                norm == 0.0,
                self.MAX_FACTOR,
                jnp.where(accept,
                          jnp.minimum(self.MAX_FACTOR, raw),
                          jnp.maximum(self.MIN_FACTOR, raw)),
            )
            h_next = h_c * factor.astype(tdt)

            y = jnp.where(accept, y_new, y)
            k1 = jnp.where(accept, ks[6], k1)  # FSAL
            t = jnp.where(accept, t + h_c, t)
            return (y, k1, t, h_next, nfe + 6, steps + 1)

        return jax.lax.while_loop(cond, body, carry)

    def adaptive_finalize(self, carry, denoise=True, eps=1e-3):
        """(y, nfe) after the optional mean-only denoise microstep."""
        y, _, _, _, nfe, _ = carry
        if denoise:
            t_end = jnp.asarray(self.sde.T - eps, time_dtype())
            dt_c = jnp.asarray(eps, y.dtype)
            y = y + self._drift(y, t_end) * dt_c
            nfe = nfe + 1
        return y, nfe

    def sample_with_nfe(self, key, batch, denoise=True, eps=1e-3):
        del key
        carry = self.adaptive_init(batch, eps)
        carry = self.adaptive_run(carry, eps)
        return self.adaptive_finalize(carry, denoise=denoise, eps=eps)

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del ts, n_discrete_steps
        y, nfe = self.sample_with_nfe(key, batch, denoise=denoise, eps=eps)
        if not isinstance(nfe, jax.core.Tracer):
            self.nfe += int(nfe)
            self._counter += 1
        return y


def _gl_panel_grid(n_panels: int, n_nodes: int, refine: float = 0.25):
    """Gauss--Legendre nodes/weights on [0, 1], composited over ``n_panels``
    geometrically refined toward 1 (the small-``t_phys`` edge of a sampler
    interval, where the epsilon-coefficient ``L^{-T}`` has an integrable
    ~1/sqrt(s) growth that plain GL resolves poorly when the singular edge
    sits inside a single wide panel). Returns ([Q], [Q]) numpy arrays."""
    edges = 1.0 - refine ** np.arange(n_panels + 1)
    edges[0], edges[-1] = 0.0, 1.0
    xs, ws = np.polynomial.legendre.leggauss(n_nodes)
    xs, ws = (xs + 1.0) / 2.0, ws / 2.0
    lo, hi = edges[:-1, None], edges[1:, None]
    nodes = (lo + (hi - lo) * xs[None, :]).ravel()
    weights = ((hi - lo) * ws[None, :]).ravel()
    return nodes, weights


def _mat2(a, b):
    """Product of two 2x2 matrices given as 4-tuples (row-major)."""
    a11, a12, a21, a22 = a
    b11, b12, b21, b22 = b
    return (a11 * b11 + a12 * b21, a11 * b12 + a12 * b22,
            a21 * b11 + a22 * b21, a21 * b12 + a22 * b22)


@register_module(category="samplers", name="ei_ode")
class EIODESampler(Sampler):
    """Exponential-integrator probability-flow ODE sampler (TPU-native
    extension; no reference counterpart -- the reference's only deterministic
    sampler is the host-bound black-box RK45, main/samplers/ode.py:8-76).

    The PSLD probability-flow ODE is *linear plus an eps-prediction term*::

        du/dtau = -(beta/2) A u - (beta/2) G^2 L^{-T}(t) eps_hat(u, t)

    (t = T - tau; A, G from psld.py:330-343; score = -L^{-T} eps_hat). The
    sampler integrates the linear part EXACTLY with the same closed-form
    matrix exponential the perturbation kernel uses
    (:meth:`psld_tpu.sde.psld.PSLD._exp_half_As`) and treats only the
    network output as slowly varying -- the DPM-Solver construction
    generalized to the 2x2 phase-space system (for VPSDE it reduces to
    DPM-Solver's eps-form). Per interval ``[tau_k, tau_{k+1}]``::

        u_{k+1} = E_k u_k - Psi0_k eps_k - Psi1_k (eps_k - eps_{k-1})/dtau_{k-1}

    with ``E_k = exp(-A s_k / 2)`` and the 2x2 matrices ``Psi0/Psi1 =
    int exp(-A s_rem(tau')/2) W(tau') (tau'-tau_k)^{0,1} dtau'`` evaluated by
    panel-composited Gauss--Legendre quadrature on SCALARS -- the whole
    coefficient table for the grid is computed once outside the scan, so the
    compiled scan body is one network forward plus a handful of scalar*tensor
    FMAs. NFE = n_steps (+1 denoise), like Euler, with multistep second-order
    accuracy (``order=2`` default; ``order=1`` holds eps constant per step;
    ``order=3`` adds quadratic Newton extrapolation through the last three
    eps evaluations weighted by an exact second-moment table Psi2).

    Exactness of the linear transport is what distinguishes this from
    ``rk_ode``: stiffness from the OU part (large nu) costs nothing, and the
    eps parameterization stays O(1) where the score blows up at t -> 0.

    Measured operating envelope (exact-score Gaussian transport, terminal
    error vs a tight adaptive reference, tests/test_samplers.py): order 2
    beats Euler ~11x at NFE=20, ~12x at 50, ~17x at 100 (and Heun at
    matched NFE by more). Below ~NFE 15 every fixed-grid PF integrator
    diverges on the SOTA CIFAR-10 operating point -- the reverse-time
    linear flow is expansive (e^{lam s} per step with s = int beta), and
    the multistep extrapolation amplifies first -- so ei_ode's documented
    regime is NFE >= 20, the same caveat class as SSCS-2M. order=3 extends
    the gain (2-3.5x below order 2 at NFE 50-200, measured) but raises the
    floor: it diverges below ~NFE 30 on the same operating point, so its
    documented regime is NFE >= 30.
    """

    def __init__(self, config, sde, score_fn, corrector_fn=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        scfg = config.evaluation.sampler
        self.order = int(scfg.get("order", 2))
        assert self.order in (1, 2, 3), self.order
        self.quad_panels = int(scfg.get("quad_panels", 6))
        self.quad_nodes = int(scfg.get("quad_nodes", 16))

    # -- coefficient tables (scalar, precomputed per grid) -------------------
    def _w_entries(self, t_phys):
        """W(t) = (beta/2) G^2 L^{-T}(t) as 4 per-element scalars. In the
        reduced-score modes G^2's zero row and L^{-T}'s triangular zero
        annihilate exactly the entries that would read the zero-filled half
        of eps (matching get_score's convention, psld.py:230-260)."""
        sde = self.sde
        var = sde._cov(0.0, sde.mm_0, t_phys)
        c11, c12, c21, c22 = sde.get_inv_coeff(var)
        hb = 0.5 * sde.beta_t(t_phys)
        gx, gm = sde.gamma, sde.m * sde.nu
        return hb * gx * c11, hb * gx * c12, hb * gm * c21, hb * gm * c22

    def _tables(self, ts):
        """(E[n,4], Psi0[n,4], Psi1[n,4]) in the time dtype. For VPSDE the
        system is 1x1; the unused entries are zero."""
        sde = self.sde
        ta, tb = ts[:-1], ts[1:]
        dtau = tb - ta
        rel_x, rel_w = _gl_panel_grid(self.quad_panels, self.quad_nodes)
        rel_x = jnp.asarray(rel_x, ts.dtype)
        rel_w = jnp.asarray(rel_w, ts.dtype)
        taus = ta[:, None] + dtau[:, None] * rel_x[None, :]   # [n, Q]
        wq = dtau[:, None] * rel_w[None, :]
        t_phys = sde.T - taus
        if self.sde.is_augmented:
            s_rem = sde.b_t(t_phys) - sde.b_t(sde.T - tb)[:, None]
            e_rem = sde._exp_half_As(-s_rem)
            integrand = _mat2(e_rem, self._w_entries(t_phys))
            s_full = sde.b_t(sde.T - ta) - sde.b_t(sde.T - tb)
            e_full = sde._exp_half_As(-s_full)
        else:
            s_rem = _vpsde_b(sde, t_phys) - _vpsde_b(sde, sde.T - tb)[:, None]
            e = jnp.exp(0.5 * s_rem)
            w = 0.5 * sde.beta_t(t_phys) / sde._std(t_phys)
            z = jnp.zeros_like(e)
            integrand = (e * w, z, z, z)
            s_full = _vpsde_b(sde, sde.T - ta) - _vpsde_b(sde, sde.T - tb)
            ef = jnp.exp(0.5 * s_full)
            zf = jnp.zeros_like(ef)
            e_full = (ef, zf, zf, zf)

        def quad(extra):
            return jnp.stack(
                [jnp.sum(wq * extra * m, axis=1) for m in integrand], axis=-1)

        psi0 = quad(jnp.ones_like(wq))
        psi1 = quad(taus - ta[:, None])
        if self.order < 3:
            return jnp.stack(e_full, axis=-1), psi0, psi1
        psi2 = quad((taus - ta[:, None]) ** 2)
        return jnp.stack(e_full, axis=-1), psi0, psi1, psi2

    # -- state application ----------------------------------------------------
    def _apply(self, coefs4, z):
        """Apply a 2x2 scalar matrix (4-vector, row-major) to the phase-space
        halves of ``z`` (or the scalar [0] entry for non-augmented SDEs)."""
        c = [coefs4[i].astype(z.dtype) for i in range(4)]
        if not self.sde.is_augmented:
            return c[0] * z
        x, m = split_xm(z)
        return join_xm(c[0] * x + c[1] * m, c[2] * x + c[3] * m)

    def _eps_eval(self, u, tau):
        """The per-node effective eps: one network forward, zero-padded in
        the reduced-score modes. Overridable hook (the guided subclass
        folds the classifier gradient in here, so the multistep
        extrapolation and quadrature weights apply to the guided eps)."""
        tv = jnp.full((u.shape[0],), self.sde.T - tau, dtype=tau.dtype)
        return self._pad_eps(self.score_fn(
            u.astype(jnp.float32), tv.astype(jnp.float32))).astype(u.dtype)

    def _pad_eps(self, eps_hat):
        """Zero-fill the unused half in the reduced-output modes, mirroring
        get_score (psld.py:230-260); the W entries that would read the
        padding are identically zero (see _w_entries)."""
        sde = self.sde
        if not sde.is_augmented:
            return eps_hat
        if sde.decomp_mode == "lower" and sde.mode == "score_m":
            return join_xm(jnp.zeros_like(eps_hat), eps_hat)
        if sde.decomp_mode == "upper" and sde.mode == "score_x":
            return join_xm(eps_hat, jnp.zeros_like(eps_hat))
        return eps_hat

    # -- segmented protocol (evaluation.nfe_per_dispatch) --------------------
    # The multistep state (previous eps evaluations + step sizes) rides the
    # scan carry, so chaining the SAME body over host-sliced rows of the
    # precomputed coefficient tables reproduces the single-scan trajectory
    # bit for bit — the deterministic analogue of the SDE family's
    # segmented API (sde_samplers.py:93-99). One caveat: XLA may unroll a
    # trip-count-1 scan and contract FMAs differently inside the unrolled
    # body, which order 3 can amplify when run below its stability floor
    # (CPU backend, NFE < 30; gated by allclose in tests/test_samplers.py);
    # orders 1-2 are bit-exact everywhere and all orders measure bit-exact
    # on TPU (scripts/results_r4.jsonl `ei3_identity` rows).
    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        del key  # deterministic sampler
        u = batch
        zero = jnp.zeros(u.shape, u.dtype)
        one = jnp.asarray(1.0, ts.dtype)
        if self.order == 3:
            return (u, zero, zero, one, one)
        return (u, zero, one)

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        ta, tb = ts[:-1], ts[1:]
        n = ta.shape[0]
        if self.order == 3:
            e_tab, psi0, psi1, psi2 = self._tables(ts)
            # steps 0/1 fall back to order 1/2 via the m1/m2 masks
            m1 = (jnp.arange(n) >= 1).astype(ts.dtype)
            m2 = (jnp.arange(n) >= 2).astype(ts.dtype)
            return (ta, tb - ta, m1, m2, e_tab, psi0, psi1, psi2)
        e_tab, psi0, psi1 = self._tables(ts)
        first = (jnp.arange(n) == 0).astype(ts.dtype)
        return (ta, tb - ta, first, e_tab, psi0, psi1)

    def segment_body(self, carry, inp):
        if self.order == 3:
            # quadratic Newton extrapolation through the last three eps
            # evaluations (backward divided differences on the non-uniform
            # tau grid), weighted by the exact second-moment table Psi2
            u, e_p, e_pp, h1, h2 = carry
            tau, dtau, m1f, m2f, e_row, p0_row, p1_row, p2_row = inp
            eps_hat = self._eps_eval(u, tau)
            d1 = (eps_hat - e_p) * (m1f / h1).astype(u.dtype)
            d1p = (e_p - e_pp) * (m2f / h2).astype(u.dtype)
            d2 = (d1 - d1p) * (m2f / (h1 + h2)).astype(u.dtype)
            c1 = d1 + h1.astype(u.dtype) * d2
            u_new = (self._apply(e_row, u) - self._apply(p0_row, eps_hat)
                     - self._apply(p1_row, c1) - self._apply(p2_row, d2))
            return (u_new, eps_hat, e_p, dtau, h1), None
        u, eps_prev, dt_prev = carry
        tau, dtau, first_f, e_row, p0_row, p1_row = inp
        eps_hat = self._eps_eval(u, tau)
        u_new = self._apply(e_row, u) - self._apply(p0_row, eps_hat)
        if self.order == 2:
            slope = (eps_hat - eps_prev) * (
                (1.0 - first_f) / dt_prev).astype(u.dtype)
            u_new = u_new - self._apply(p1_row, slope)
        return (u_new, eps_hat, dtau), None

    def segment_finalize(self, carry, ts, denoise=True, eps=1e-3):
        u = carry[0]
        if denoise:
            tv = jnp.full((u.shape[0],),
                          jnp.asarray(self.sde.T - eps, ts.dtype))
            f, _ = self.sde.reverse_sde(u, tv, self.score_fn,
                                        probability_flow=True)
            u = u + f * jnp.asarray(eps, u.dtype)
        return u

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del n_discrete_steps
        carry = self.segment_init(key, batch, ts, denoise, eps)
        carry, _ = jax.lax.scan(self.segment_body, carry,
                                self.segment_xs(ts, denoise, eps))
        return self.segment_finalize(carry, ts, denoise, eps)


@register_module(category="samplers", name="cc_ei_ode")
class ClassCondEIODESampler(EIODESampler):
    """Classifier-guided exponential-integrator PF-ODE sampler (TPU-native
    extension; the reference's only guided sampler is the 1000-NFE EM,
    main/samplers/sde.py:61-122 — deterministic low-NFE guided sampling
    has no counterpart there).

    Guidance enters in eps space: score_guided = score + temp*grad with
    score = -L^{-T} eps gives ``eps_eff = eps_hat - L^T(t) grad`` (the
    identity W L^T = (beta/2) G^2 makes the existing Psi quadrature
    tables integrate the guidance term too), so the whole EI machinery —
    exact linear transport, multistep extrapolation — applies to the
    guided field unchanged. L^T(t) comes from the same scalar
    factorization pipeline as the kernel (``get_coeff``); for VPSDE it
    reduces to the scalar ``std(t)``. The final mean-only denoise
    microstep (dt = eval_eps) stays unguided — its contribution is
    O(eps).

    Plugs into the guided entry point via
    ``dataset.diffusion.evaluation.sampler.name=cc_ei_ode`` (same
    clf_fn/y/traced-label mechanics as ``cc_em_sde``).
    """

    def __init__(self, config, sde, score_fn, clf_fn, corrector_fn=None,
                 y=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        self.clf_fn = clf_fn
        self.y = y if y is not None else int(
            config.clf.evaluation.label_to_sample)
        self.clf_temp = float(config.clf.evaluation.clf_temp)
        from psld_tpu.samplers.sde_samplers import clf_time_convention

        self.clf_time_convention = clf_time_convention(config)

    def _lt_entries(self, t_phys):
        """L^T(t) as 4 row-major scalars (transpose of the kernel factor)."""
        sde = self.sde
        if not sde.is_augmented:
            s = sde._std(t_phys)
            z = jnp.zeros_like(s)
            return (s, z, z, z)
        l11, l12, l21, l22 = sde.get_coeff(sde._cov(0.0, sde.mm_0, t_phys))
        return (l11, l21, l12, l22)

    def _eps_eval(self, u, tau):
        from psld_tpu.samplers.sde_samplers import \
            ClassCondEulerMaruyamaSampler as _CC

        eps_hat = super()._eps_eval(u, tau)
        t_phys = self.sde.T - tau
        # the kernel factor L^T lives at physical (diffusion) time always;
        # only the classifier's conditioning time follows the convention
        t_clf = tau if self.clf_time_convention == "reference" else t_phys
        grad = _CC._guidance(self, u, t_clf).astype(u.dtype)
        return eps_hat - self._apply(self._lt_entries(t_phys), grad)


def _vpsde_b(sde, t):
    """int_0^t beta for VPSDE, derived from the SDE's own schedule
    (b(t) = -2*log E[x_t|x_0]/x_0) so a changed/subclassed schedule
    can't desync the ei_ode transport tables from the SDE."""
    return -2.0 * sde._log_mean_coeff(t)


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

    # segmented protocol: the carry is just x (single-step method, no
    # multistep memory), so segmentation is trivially bit-identical
    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        del key  # deterministic sampler
        return batch

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        return (ts[:-1], ts[1:])

    def segment_body(self, x, inp):
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

    def segment_finalize(self, x, ts, denoise=True, eps=1e-3):
        if denoise:
            dt_c = jnp.asarray(eps, ts.dtype)
            x = x + self._drift(x, jnp.asarray(self.sde.T - eps,
                                               ts.dtype)) * dt_c.astype(x.dtype)
        return x

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del n_discrete_steps
        carry = self.segment_init(key, batch, ts, denoise, eps)
        carry, _ = jax.lax.scan(self.segment_body, carry,
                                self.segment_xs(ts, denoise, eps))
        return self.segment_finalize(carry, ts, denoise, eps)
