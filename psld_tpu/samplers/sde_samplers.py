"""Reverse-SDE samplers: Euler--Maruyama, classifier-guided EM, inpainting
EM, and SSCS symmetric splitting (reference main/samplers/sde.py).

Every sampler's loop is a single ``lax.scan``; randomness threads an explicit
PRNG key through the carry. Per-device sample diversity comes from folding
the device/batch index into the key at the call site (replacing the
reference's per-rank ``seed_everything(seed + global_rank)``,
wrapper.py:93-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import register_module
from psld_tpu.samplers.base import Sampler
from psld_tpu.sde.psld import join_xm, split_xm
from psld_tpu.utils.numerics import bcast_right


def _em_update(sde, score_fn, x, t, dt, key, flag=None, guidance=None):
    """One Euler--Maruyama predictor step (reference samplers/sde.py:16-26);
    the single implementation shared by the EM, guided, and inpainting scan
    bodies and the SSCS final denoise.

    ``t``/``dt`` are scalars in the time dtype; tensors stay in x.dtype.
    ``key=None`` gives the mean-only denoise step; ``flag`` (0/1, may be a
    traced scan input) gates the noise term; ``guidance`` optionally adds
    ``g^2 * guidance(x)`` to the reverse drift (reference sde.py:94).
    """
    tv = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
    f, g = sde.reverse_sde(x, tv, score_fn)
    if guidance is not None:
        f = f + g * g * guidance(x).astype(x.dtype)
    dt_c = jnp.asarray(dt).astype(x.dtype)
    x_mean = x + f * dt_c
    if key is None:
        return x_mean, x_mean
    noise = jax.random.normal(key, x.shape, x.dtype)
    fl = 1.0 if flag is None else flag.astype(x.dtype)
    return x_mean + fl * g * jnp.sqrt(dt_c) * noise, x_mean


def _corrected(sampler, x, t, dt, flag, key=None):
    """Apply the corrector hook except on the flag=0 denoise row; lax.cond
    skips the corrector's network evaluation entirely on that row instead of
    computing and discarding it. ``key`` feeds stochastic correctors
    (Langevin); deterministic 3-arg correctors never see it."""
    if sampler.corrector_fn is None:
        return x
    return jax.lax.cond(
        flag > 0,
        lambda x_: sampler.corrector_update_fn(x_, t, dt, key=key)[0],
        lambda x_: x_,
        x,
    )


def _split_with_corrector(sampler, key):
    """One predictor key per step, plus a corrector key only when a
    corrector is attached -- keeping the no-corrector RNG stream
    bit-identical to the plain samplers (pinned by the reference
    trajectory-parity tests)."""
    if sampler.corrector_fn is None:
        key, sub = jax.random.split(key)
        return key, sub, None
    key, sub, csub = jax.random.split(key, 3)
    return key, sub, csub


def _step_grid(sde, ts, denoise: bool, eps: float):
    """(t, dt, noise_flag) triples; when denoising, the final mean-only step
    (reference sde.py:52-57) is appended to the grid with its noise zeroed so
    the whole trajectory is ONE scan with a single network-forward instance
    in the compiled program (halves XLA compile time for 100M-param nets)."""
    t_grid = ts[:-1]
    dt_grid = ts[1:] - ts[:-1]
    flags = jnp.ones_like(t_grid)
    if denoise:
        t_grid = jnp.concatenate(
            [t_grid, jnp.asarray([sde.T - eps], ts.dtype)])
        dt_grid = jnp.concatenate([dt_grid, jnp.asarray([eps], ts.dtype)])
        flags = jnp.concatenate([flags, jnp.zeros((1,), ts.dtype)])
    return t_grid, dt_grid, flags


@register_module(category="samplers", name="em_sde")
class EulerMaruyamaSampler(Sampler):
    """(reference samplers/sde.py:9-58)

    Segmented API (``segment_init/xs/body/finalize``): ``sample`` is ONE
    scan over the full grid; ``evaluation.nfe_per_dispatch`` (the eval
    drivers) chains the SAME body over host-sliced grid chunks carrying
    (state, key) between dispatches — bit-identical trajectories, but no
    single device dispatch exceeds the runtime's watchdog (the tunneled
    v5e kills dispatches >~60 s; the reference's Python loop never had a
    dispatch ceiling, main/samplers/sde.py:38-58).
    """

    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        return (batch, key)

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        return _step_grid(self.sde, ts, denoise, eps)

    def segment_body(self, carry, inp):
        x, key = carry
        t, dt, flag = inp
        key, sub, csub = _split_with_corrector(self, key)
        x, _ = _em_update(self.sde, self.score_fn, x, t, dt, sub, flag)
        x = _corrected(self, x, t, dt, flag, csub)
        return (x, key), None

    def segment_finalize(self, carry, ts, denoise=True, eps=1e-3):
        return carry[0]

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del n_discrete_steps  # static: len(ts) - 1
        carry = self.segment_init(key, batch, ts, denoise, eps)
        carry, _ = jax.lax.scan(self.segment_body, carry,
                                self.segment_xs(ts, denoise, eps))
        return self.segment_finalize(carry, ts, denoise, eps)


def clf_time_convention(config) -> str:
    """Which time the classifier is conditioned on during guided sampling:

    - ``diffusion`` (default): ``T - t`` — the classifier's training
      distribution (losses.py:150-177 perturbs to diffusion time, and the
      reference's own inpainter conditions at ``T - t``, sde.py:141).
    - ``reference``: raw sampler time ``t`` — bit-reproduces the reference
      guided sampler (main/samplers/sde.py:87-88 passes the un-flipped loop
      time), which an imported published reference classifier checkpoint
      was evaluated under.

    Config key: ``evaluation.sampler.clf_time_convention`` (optional).
    """
    sampler_cfg = config.evaluation.get("sampler") or {}
    conv = str(sampler_cfg.get("clf_time_convention", "diffusion"))
    if conv not in ("diffusion", "reference"):
        raise ValueError(
            "evaluation.sampler.clf_time_convention must be 'diffusion' or "
            f"'reference'; got {conv!r}")
    return conv


@register_module(category="samplers", name="cc_em_sde")
class ClassCondEulerMaruyamaSampler(EulerMaruyamaSampler):
    """EM with classifier guidance (reference samplers/sde.py:61-122).

    The guidance gradient is ``jax.grad`` of the selected log-softmax w.r.t.
    the full phase-space state -- no inference_mode/requires_grad dance.

    Deliberate deviation (toggleable): by default the classifier is
    conditioned on diffusion time ``T - t`` (its training distribution,
    losses.py:150-177) whereas the reference passes raw sampler time
    (sde.py:87) while flipping time for the score net inside reverse_sde
    (psld.py:345-364) -- an internal inconsistency there; the reference's
    own inpainter uses ``T - t``. Set
    ``evaluation.sampler.clf_time_convention=reference`` to bit-reproduce
    the reference's published guided behavior with imported classifiers.
    """

    def __init__(self, config, sde, score_fn, clf_fn, corrector_fn=None,
                 y=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        self.clf_fn = clf_fn
        # y may be a Python int (from config, compiled as a constant) or a
        # traced int32 scalar -- passing it as a jit ARGUMENT lets ONE
        # compiled program sample any class (a per-label recompile costs
        # minutes on remote-compile backends)
        self.y = y if y is not None else int(
            config.clf.evaluation.label_to_sample)
        self.clf_temp = float(config.clf.evaluation.clf_temp)
        self.clf_time_convention = clf_time_convention(config)

    def _guidance(self, x, t_phys):
        def selected_logp(x_in):
            tv = jnp.full((x_in.shape[0],), t_phys).astype(jnp.float32)
            logits = self.clf_fn(x_in.astype(jnp.float32), tv)
            logp = jax.nn.log_softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(self.y, logp.shape[-1], dtype=logp.dtype)
            return jnp.sum(logp * onehot)

        return jax.grad(selected_logp)(x) * self.clf_temp

    def segment_body(self, carry, inp):
        x, key = carry
        t, dt, flag = inp
        # final denoise = full guided predictor step keeping the mean
        # (reference sde.py:116-121) -> same scan with noise flag zeroed
        reference_time = self.clf_time_convention == "reference"
        t_clf = t if reference_time else self.sde.T - t
        key, sub, csub = _split_with_corrector(self, key)
        x, _ = _em_update(
            self.sde, self.score_fn, x, t, dt, sub, flag,
            guidance=lambda xx: self._guidance(xx, t_clf))
        x = _corrected(self, x, t, dt, flag, csub)
        return (x, key), None


@register_module(category="samplers", name="ip_em_sde")
class EulerMaruyamaInpainter(EulerMaruyamaSampler):
    """RePaint-style phase-space inpainting (reference samplers/sde.py:125-224):
    each EM step overwrites the known region (both x and m channels) with the
    forward-diffused known image. Inherits the generic segmented ``sample``;
    the known image + mask ride the scan carry."""

    def _perturb(self, x_0, t, key):
        """Forward-diffuse the known image to time t (sde.py:134-149)."""
        k_m, k_eps = jax.random.split(key)
        if self.config.training.mode == "hsm":
            m_0 = jnp.zeros_like(x_0)
            mm_0 = self.sde.mm_0
        else:
            m_0 = float(np.sqrt(self.sde.mm_0)) * jax.random.normal(
                k_m, x_0.shape, x_0.dtype)
            mm_0 = 0.0
        eps = jax.random.normal(
            k_eps, x_0.shape[:-1] + (2 * x_0.shape[-1],), x_0.dtype)
        z_t, mu_t, _ = self.sde.perturb_data(x_0, m_0, 0.0, mm_0, t, eps)
        return z_t, mu_t

    def _stitch(self, z, z_known, mask):
        x_c, m_c = split_xm(z)
        x_k, m_k = split_xm(z_known)
        x_c = x_c * (1 - mask) + x_k * mask
        m_c = m_c * (1 - mask) + m_k * mask
        return join_xm(x_c, m_c)

    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        x_0, mask = batch
        key, k_prior, k_init = jax.random.split(key, 3)

        # initial latent: prior with the known region stitched in at t = T
        x = self.sde.prior_sampling(k_prior, x_0.shape, x_0.dtype)
        tv = jnp.full((x_0.shape[0],), self.sde.T, dtype=ts.dtype)
        u_k, _ = self._perturb(x_0, tv, k_init)
        x = self._stitch(x, u_k, mask)
        # the known image + mask ride the carry so segmented dispatches
        # re-stitch without re-staging the batch
        return (x, key, x_0, mask)

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        # denoise folded into the scan: the flag zeroes both the EM noise
        # and the stitched known-region noise (reference keeps the mean,
        # sde.py:215-223)
        return _step_grid(self.sde, ts, denoise, eps)

    def segment_body(self, carry, inp):
        x, key, x_0, mask = carry
        t, dt, flag = inp
        key, k_step, k_perturb = jax.random.split(key, 3)
        x, _ = _em_update(self.sde, self.score_fn, x, t, dt, k_step,
                          flag)
        tvk = jnp.full((x.shape[0],), self.sde.T - t, dtype=t.dtype)
        u_k, mu_k = self._perturb(x_0, tvk, k_perturb)
        fl = flag.astype(x.dtype)
        known = mu_k.astype(x.dtype) + fl * (u_k - mu_k).astype(x.dtype)
        x = self._stitch(x, known, mask)
        return (x, key, x_0, mask), None


@register_module(category="samplers", name="edit_em_sde")
class EditEulerMaruyamaSampler(EulerMaruyamaSampler):
    """SDEdit-style guided editing (TPU-native extension; no reference
    counterpart): forward-diffuse a guide image to an intermediate time
    ``t0 = evaluation.sampler.edit_t0`` (the edit strength) through the
    training perturbation kernel, then run the reverse EM loop only over
    ``[T - t0, T - eps]``. Small ``t0`` preserves the guide's structure
    (local edits / denoising-style cleanup); ``t0 -> T`` reduces to
    unconditional generation from the prior marginal. Phase space: the
    momentum channel is initialized exactly as the loss does (hsm: m_0=0
    with kernel variance kappa*m; dsm: m_0 ~ N(0, kappa*m), zero kernel
    variance), so the edit start state sits on the training marginal at
    t0.

    The caller passes the standard ``[0, T-eps]`` grid; the sampler maps
    it affinely onto ``[T - t0, T - eps]`` (stride shape preserved), so
    every fan-out/stride mechanism of the eval pipeline works unchanged.
    """

    def __init__(self, config, sde, score_fn, corrector_fn=None):
        super().__init__(config, sde, score_fn, corrector_fn=corrector_fn)
        self.edit_t0 = float(config.evaluation.sampler.get("edit_t0", 0.5))
        if not 0.0 < self.edit_t0 <= float(sde.T):
            raise ValueError(
                f"evaluation.sampler.edit_t0 must be in (0, T={sde.T}]; "
                f"got {self.edit_t0}")

    def _init_latent(self, x_0, t0, key):
        """Forward-diffuse the guide to physical time t0 (the same kernel
        the losses perturb with, losses/score.py; reference psld.py:262-287)."""
        sde = self.sde
        tv = jnp.full((x_0.shape[0],), t0)
        if not sde.is_augmented:
            eps = jax.random.normal(key, x_0.shape, x_0.dtype)
            return sde.perturb_data(x_0, tv, eps)
        k_m, k_eps = jax.random.split(key)
        if str(self.config.training.mode) == "hsm":
            m_0 = jnp.zeros_like(x_0)
            mm_0 = sde.mm_0
        else:
            m_0 = float(np.sqrt(sde.mm_0)) * jax.random.normal(
                k_m, x_0.shape, x_0.dtype)
            mm_0 = 0.0
        eps = jax.random.normal(
            k_eps, x_0.shape[:-1] + (2 * x_0.shape[-1],), x_0.dtype)
        z_t, _, _ = sde.perturb_data(x_0, m_0, 0.0, mm_0, tv, eps)
        return z_t

    def _edit_ts(self, ts, eps):
        # affine map of the [0, T-eps] grid onto [T-t0, T-eps]
        t0 = jnp.asarray(self.edit_t0, ts.dtype)
        return (self.sde.T - t0) + ts * ((t0 - eps) / (self.sde.T - eps))

    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        key, k_init = jax.random.split(key)
        x = self._init_latent(batch, jnp.asarray(self.edit_t0, ts.dtype),
                              k_init)
        return (x, key)

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        return _step_grid(self.sde, self._edit_ts(ts, eps), denoise, eps)


@register_module(category="samplers", name="sscs_sde")
class SSCSSampler(Sampler):
    """Symmetric Splitting CLD Sampler for PSLD
    (reference samplers/sde.py:227-370): analytical OU half-step ->
    Euler score step -> analytical OU half-step, closed forms from
    :meth:`psld_tpu.sde.psld.PSLD.sscs_transition`.
    """

    def analytical_dynamics(self, u, t, dt, key):
        tv = jnp.full((u.shape[0],), t, dtype=t.dtype)
        (m11, m12, m21, m22), var = self.sde.sscs_transition(tv, dt)
        x, m = split_xm(u)
        nd = x.ndim

        def c(v):
            return bcast_right(v, nd).astype(u.dtype)

        mu = join_xm(c(m11) * x + c(m12) * m, c(m21) * x + c(m22) * m)
        l11, l12, l21, l22 = self.sde.get_coeff(var)
        eps = jax.random.normal(key, u.shape, u.dtype)
        e_x, e_m = split_xm(eps)
        noise = join_xm(c(l11) * e_x + c(l12) * e_m,
                        c(l21) * e_x + c(l22) * e_m)
        return mu + noise

    def score_term(self, u, t):
        """Drift of the split score sub-flow, ``N(u, t)`` — the bracketed
        terms of the reference's Euler score step (sde.py:314-329):
        ``[gamma*beta*(score_x + x), m*nu*beta*(score_m + m_inv*m)]``."""
        sde = self.sde
        tv = jnp.full((u.shape[0],), sde.T - t, dtype=t.dtype)
        beta = bcast_right(sde.beta_t(tv), u.ndim).astype(u.dtype)
        x, m = split_xm(u)
        eps_pred = self.score_fn(u.astype(jnp.float32), tv.astype(jnp.float32))
        score = sde.get_score(eps_pred, 0.0, sde.mm_0, tv).astype(u.dtype)
        score_x, score_m = split_xm(score)
        return join_xm(sde.gamma * beta * (score_x + x),
                       sde.m * sde.nu * beta * (score_m + sde.m_inv * m))

    def euler_score_dynamics(self, u, t, dt):
        """(reference sde.py:314-329)"""
        return u + jnp.asarray(dt).astype(u.dtype) * self.score_term(u, t)

    def predictor_update_fn(self, u, t, dt, key):
        k1, k2 = jax.random.split(key)
        u = self.analytical_dynamics(u, t, dt / 2, k1)
        u = self.euler_score_dynamics(u, t, dt)
        u = self.analytical_dynamics(u, t, dt / 2, k2)
        return u

    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        return (batch, key)

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        return (ts[:-1], ts[1:])

    def segment_body(self, carry, inp):
        x, key = carry
        t, t_next = inp
        key, sub, csub = _split_with_corrector(self, key)
        x = self.predictor_update_fn(x, t, t_next - t, sub)
        x, _ = self.corrector_update_fn(x, t, t_next - t, key=csub)
        return (x, key), None

    def segment_finalize(self, carry, ts, denoise=True, eps=1e-3):
        x = carry[0]
        if denoise:
            x = _em_update(self.sde, self.score_fn, x,
                           jnp.asarray(self.sde.T - eps, ts.dtype),
                           jnp.asarray(eps, ts.dtype), None)[0]
        return x

    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        del n_discrete_steps
        carry = self.segment_init(key, batch, ts, denoise, eps)
        carry, _ = jax.lax.scan(self.segment_body, carry,
                                self.segment_xs(ts, denoise, eps))
        return self.segment_finalize(carry, ts, denoise, eps)


@register_module(category="samplers", name="sscs2m_sde")
class SSCS2MSampler(SSCSSampler):
    """Second-order multistep SSCS — a TPU-native extension with no
    reference counterpart (the reference's highest-order PSLD SDE sampler
    is plain SSCS, samplers/sde.py:227-370).

    SSCS integrates the split score sub-flow ``du/dtau = N(u, tau)`` with
    one explicit Euler step per interval. SSCS-2M upgrades that stage to a
    Lawson-type exponential Adams--Bashforth-2 step: the previous
    interval's score term is transported to the current evaluation frame
    through the intervening analytical OU *mean* maps (the exact linear
    propagator the splitting already computes) and combined with
    non-uniform AB2 weights ``(1 + rho/2, -rho/2)``, ``rho = dt_k /
    dt_{k-1}``. The stochastic OU half-steps are untouched — with the same
    outer key the injected noise sequence is bit-identical to SSCS — so
    only the deterministic score stage gains an order. The first interval
    (no history yet) is exactly one SSCS step.

    Measured operating envelope — two regimes, measured separately:

    * Exact-score Gaussian transport (tests/test_samplers.py): on
      UNIFORM grids the terminal-moment error drops 1.2x / 4.2x / 2.5x
      vs SSCS at 20 / 50 / 100 NFE; on quadratic grids or at <=10 NFE
      plain SSCS transports moments better (the score term's curvature
      blows up toward t = T and the AB2 extrapolation amplifies it).
    * Trained 97.6M flagship, weight-free quality proxies (round-5
      matrix, scripts/results_r5_matrix.jsonl): the picture INVERTS —
      on QUADRATIC grids sscs2m dominates the whole sampler matrix
      (NFE-50: SWD 18.7 vs plain SSCS 39.7, matching 1000-NFE EM
      quality at ~20x its throughput; NFE-100: SWD 16.9), while on
      uniform grids it shows no advantage over SSCS. The quadratic
      grid clusters steps where the learned score actually varies,
      which is precisely where the AB2 history pays off.

    Recommended production operating point: quadratic stride, NFE
    50-100. The exact-score caveat still governs moment-transport
    applications (likelihood-style uses) on quadratic grids.
    """

    def _linear_mean(self, v, t, dt):
        """Apply the reverse-time OU mean map over [t, t+dt] to ``v`` —
        ``analytical_dynamics`` without the noise draw."""
        tv = jnp.full((v.shape[0],), t, dtype=t.dtype)
        (m11, m12, m21, m22), _ = self.sde.sscs_transition(tv, dt)
        x, m = split_xm(v)
        nd = x.ndim

        def c(q):
            return bcast_right(q, nd).astype(v.dtype)

        return join_xm(c(m11) * x + c(m12) * m, c(m21) * x + c(m22) * m)

    def segment_init(self, key, batch, ts, denoise=True, eps=1e-3):
        return (batch, key, jnp.zeros_like(batch),
                jnp.asarray(1.0, ts.dtype))

    def segment_xs(self, ts, denoise=True, eps=1e-3):
        n = ts.shape[0] - 1
        first = (jnp.arange(n) == 0).astype(ts.dtype)
        return (ts[:-1], ts[1:], first)

    def segment_body(self, carry, inp):
        u, key, prev, dt_prev = carry
        t, t_next, first_f = inp
        dt = t_next - t
        key, sub, csub = _split_with_corrector(self, key)
        k1, k2 = jax.random.split(sub)  # same split as SSCS's predictor
        u = self.analytical_dynamics(u, t, dt / 2, k1)
        prev = self._linear_mean(prev, t, dt / 2)
        nterm = self.score_term(u, t)
        rho = (dt / dt_prev).astype(u.dtype)
        fl = first_f.astype(u.dtype)  # 1 on the history-free first step
        d = nterm + (1.0 - fl) * (rho / 2.0) * (nterm - prev)
        u = u + jnp.asarray(dt).astype(u.dtype) * d
        prev_next = self._linear_mean(nterm, t, dt / 2)
        u = self.analytical_dynamics(u, t, dt / 2, k2)
        u, _ = self.corrector_update_fn(u, t, dt, key=csub)
        return (u, key, prev_next, dt), None
