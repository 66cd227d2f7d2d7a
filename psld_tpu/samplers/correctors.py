"""Langevin corrector for predictor--corrector sampling.

The reference carries a ``corrector_fn`` hook on every sampler
(reference main/samplers/base.py:22-27) but never ships a concrete
corrector. This module fills that capability with the standard annealed
Langevin corrector of the score-SDE predictor--corrector samplers (Song et
al., "Score-Based Generative Modeling through SDEs"), adapted to the PSLD
phase-space state: after each predictor step at reverse-grid time ``t``,
run ``n`` steps of

    u <- u + step * score(u, T - t) + sqrt(2 * step) * z

with the per-batch step size set from the target signal-to-noise ratio,
``step = 2 * (snr * ||z|| / ||score||)^2`` (the song_sde convention with
alpha = 1).

Config surface (all optional, under ``evaluation.sampler``):
    corrector: none | langevin      (default none -- reference behavior)
    corrector_snr: float            (default 0.16, song_sde default)
    corrector_steps: int            (default 1)

Each corrector step costs one extra network evaluation; at 1000 NFE the
predictor alone matches the reference, at low NFE the corrector buys
sample quality for NFE (see tests/test_samplers.py PC tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from psld_tpu.registry import register_module


def _score(sde, score_fn, u, t_phys):
    """Score of the time-t marginal from the eps-prediction network; the
    PSLD conversion needs the stationary covariance blocks, VP-SDE only
    the std (sde/psld.py:250, sde/vpsde.py:51)."""
    eps_pred = score_fn(u.astype(jnp.float32), t_phys.astype(jnp.float32))
    if hasattr(sde, "mm_0"):
        return sde.get_score(eps_pred, 0.0, sde.mm_0, t_phys).astype(u.dtype)
    return sde.get_score(eps_pred, t_phys).astype(u.dtype)


@register_module(category="correctors", name="langevin")
class LangevinCorrector:
    """Callable matching the keyed corrector hook:
    ``corrector(x, t, dt, key) -> (x, x_mean)``."""

    def __init__(self, config, sde, score_fn):
        scfg = config.evaluation.sampler
        self.sde = sde
        self.score_fn = score_fn
        self.snr = float(scfg.get("corrector_snr", 0.16))
        self.steps = int(scfg.get("corrector_steps", 1))

    def _live_mask(self, u):
        """Which phase-space half carries a real score. In the reduced-
        output modes (hsm: score_m + lower; reference psld.py:230-260) the
        other half of get_score is ZERO-FILLED -- Langevin noise there
        would random-walk with no restoring drift and inflate the
        marginal. VP-SDE (no halves) is fully live."""
        from psld_tpu.sde.psld import join_xm

        mode = getattr(self.sde, "mode", None)
        if mode == "score_m":
            return join_xm(jnp.zeros_like(u[..., : u.shape[-1] // 2]),
                           jnp.ones_like(u[..., : u.shape[-1] // 2]))
        if mode == "score_x":
            return join_xm(jnp.ones_like(u[..., : u.shape[-1] // 2]),
                           jnp.zeros_like(u[..., : u.shape[-1] // 2]))
        return jnp.ones_like(u)

    def __call__(self, u, t, dt, key):
        sde = self.sde
        batch = u.shape[0]
        t_phys = jnp.full((batch,), sde.T - t, dtype=jnp.asarray(t).dtype)
        axes = tuple(range(1, u.ndim))
        mask = self._live_mask(u)
        u_mean = u
        for _ in range(self.steps):
            key, k_noise = jax.random.split(key)
            score = _score(sde, self.score_fn, u, t_phys) * mask
            z = jax.random.normal(k_noise, u.shape, u.dtype) * mask
            # batch-MEAN norms -> one scalar step (song_sde convention):
            # per-sample norms make the step explode for samples near the
            # mode, where ||score|| -> 0
            g_norm = jnp.sqrt((score * score).sum(axes)).mean()
            z_norm = jnp.sqrt((z * z).sum(axes)).mean()
            # song_sde step rule, alpha = 1; guard the exact-zero-score
            # corner (step would be inf)
            step = 2.0 * (self.snr * z_norm / jnp.maximum(g_norm, 1e-20)) ** 2
            u_mean = u + step * score
            u = u_mean + jnp.sqrt(2.0 * step) * z
        return u, u_mean


def build_corrector(config, sde, score_fn):
    """Corrector factory from ``evaluation.sampler.corrector`` (returns
    None for the reference-default identity)."""
    from psld_tpu.registry import get_module

    name = str(config.evaluation.sampler.get("corrector", "none"))
    if name in ("none", "None", ""):
        return None
    return get_module("correctors", name)(config, sde, score_fn)
