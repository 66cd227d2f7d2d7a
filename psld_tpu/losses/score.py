"""Score-matching losses (reference main/losses.py).

Pure-functional: each criterion is constructed from (config, sde) like the
reference but its ``__call__`` takes explicit arrays and a PRNG key and
returns a scalar loss -- no module state, no global RNG. ``score_fn`` is any
``(z, t) -> eps_pred`` callable (typically a partial over net.apply with
params bound), so the same criterion works under ``jax.grad``, ``jit`` and
multi-device sharding unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.registry import get_module, register_module
from psld_tpu.sde.psld import join_xm, split_xm


def _reduce(loss: jax.Array, strategy: str) -> jax.Array:
    return jnp.mean(loss) if strategy == "mean" else jnp.sum(loss)


@register_module(category="losses", name="score_loss")
class ScoreLoss:
    """Epsilon-prediction loss for non-augmented SDEs like VP-SDE
    (reference losses.py:20-65)."""

    def __init__(self, config, sde):
        assert config.training.loss.weighting in ("nll", "fid")
        self.sde = sde
        self.l_type = config.training.loss.l_type
        self.weighting = config.training.loss.weighting
        if self.weighting == "nll" and self.l_type != "l2":
            raise ValueError("l_type can only be `l2` when using nll weighting")
        self.reduce_strategy = (
            "mean" if config.training.loss.reduce_mean else "sum"
        )

    def __call__(self, x_0, t, score_fn, rng):
        eps = jax.random.normal(rng, x_0.shape, x_0.dtype)
        x_t = self.sde.perturb_data(x_0, t, eps)
        eps_pred = score_fn(x_t.astype(jnp.float32), t.astype(jnp.float32))

        if self.weighting == "nll":
            # g(t)^2-weighted score matching (losses.py:54-63)
            gt2 = self.sde.likelihood_weighting(t)
            gt2 = gt2.reshape(gt2.shape + (1,) * (x_0.ndim - 1)).astype(
                jnp.float32
            )
            diff = self.sde.get_score(eps_pred, t) - self.sde.get_score(eps, t)
            return _reduce(diff * diff * gt2, self.reduce_strategy)

        diff = eps - eps_pred
        loss = diff * diff if self.l_type == "l2" else jnp.abs(diff)
        return _reduce(loss, self.reduce_strategy)


def _sample_momentum(sde, x_0, mode: str, rng):
    """DSM: m_0 ~ N(0, mm_0 I), kernel mm_0 = 0; HSM: m_0 = 0, kernel
    mm_0 = kappa M (reference losses.py:95-102)."""
    if mode == "hsm":
        return jnp.zeros_like(x_0), sde.mm_0
    m_0 = float(np.sqrt(sde.mm_0)) * jax.random.normal(rng, x_0.shape,
                                                       x_0.dtype)
    return m_0, 0.0


@register_module(category="losses", name="psld_score_loss")
class PSLDScoreLoss:
    """HSM/DSM epsilon-prediction loss for PSLD (reference losses.py:68-130)."""

    def __init__(self, config, sde):
        assert config.training.loss.weighting in ("fid",)
        assert config.training.mode in ("hsm", "dsm")
        assert isinstance(sde, get_module("sde", "psld"))
        self.sde = sde
        self.l_type = config.training.loss.l_type
        self.mode = config.training.mode
        self.decomp_mode = config.model.sde.decomp_mode
        self.reduce_strategy = (
            "mean" if config.training.loss.reduce_mean else "sum"
        )

    def __call__(self, x_0, t, score_fn, rng):
        k_m, k_eps = jax.random.split(rng)
        m_0, mm_0 = _sample_momentum(self.sde, x_0, self.mode, k_m)
        eps = jax.random.normal(
            k_eps, x_0.shape[:-1] + (2 * x_0.shape[-1],), x_0.dtype
        )

        z_t, _, _ = self.sde.perturb_data(x_0, m_0, 0.0, mm_0, t, eps)
        eps_pred = score_fn(z_t.astype(jnp.float32), t.astype(jnp.float32))

        # target selection by (sde.mode, decomp) (losses.py:118-128)
        eps_x, eps_m = split_xm(eps)
        if self.sde.mode == "score_m" and self.decomp_mode == "lower":
            target = eps_m
        elif self.sde.mode == "score_x" and self.decomp_mode == "upper":
            target = eps_x
        else:
            target = eps
        assert eps_pred.shape == target.shape, (eps_pred.shape, target.shape)
        diff = target - eps_pred
        return _reduce(diff * diff, self.reduce_strategy)


@register_module(category="losses", name="tce_loss")
class PSLDTimeCELoss:
    """Time-conditional cross-entropy for the guidance classifier
    (reference losses.py:133-177). Returns (loss, top1_acc)."""

    def __init__(self, config, sde):
        assert config.diffusion.training.mode in ("hsm", "dsm")
        assert isinstance(sde, get_module("sde", "psld"))
        self.sde = sde
        self.mode = config.diffusion.training.mode
        self.reduce_strategy = (
            "mean" if config.diffusion.training.loss.reduce_mean else "sum"
        )

    def __call__(self, x_0, y, t, clf_fn, rng):
        k_m, k_eps = jax.random.split(rng)
        m_0, mm_0 = _sample_momentum(self.sde, x_0, self.mode, k_m)
        eps = jax.random.normal(
            k_eps, x_0.shape[:-1] + (2 * x_0.shape[-1],), x_0.dtype
        )
        u_t, _, _ = self.sde.perturb_data(x_0, m_0, 0.0, mm_0, t, eps)
        logits = clf_fn(u_t.astype(jnp.float32), t.astype(jnp.float32))

        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
        loss = _reduce(nll, self.reduce_strategy)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
        return loss, acc
