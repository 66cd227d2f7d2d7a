"""Loss tests (reference main/losses.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.config import ConfigDict
from psld_tpu.losses import PSLDScoreLoss, PSLDTimeCELoss, ScoreLoss
from psld_tpu.sde.psld import PSLD
from psld_tpu.sde.vpsde import VPSDE


def psld_config(mode="hsm", decomp="lower", nu=4.01, gamma=0.01):
    return ConfigDict({
        "model": {"sde": {"beta_min": 8, "beta_max": 8, "nu": nu,
                          "gamma": gamma, "kappa": 0.04,
                          "decomp_mode": decomp, "numerical_eps": 1e-9,
                          "n_timesteps": 1000}},
        "training": {"mode": mode,
                     "loss": {"l_type": "l2", "reduce_mean": True,
                              "weighting": "fid"}},
    })


def vpsde_config(weighting="fid"):
    return ConfigDict({
        "model": {"sde": {"beta_min": 0.1, "beta_max": 20,
                          "n_timesteps": 1000}},
        "training": {"loss": {"l_type": "l2", "reduce_mean": True,
                              "weighting": weighting}},
    })


def perfect_score_fn_factory(sde, mode, rng_holder):
    """Build a score_fn that returns the exact eps used by the loss.

    The loss draws (k_m, k_eps) = split(rng); replicating the draw lets us
    check the zero-loss fixed point.
    """

    def score_fn_builder(x_shape, rng):
        k_m, k_eps = jax.random.split(rng)
        eps = jax.random.normal(k_eps, x_shape[:-1] + (2 * x_shape[-1],),
                                jnp.float32)
        return eps

    return score_fn_builder


def test_psld_loss_zero_at_perfect_prediction():
    cfg = psld_config()
    sde = PSLD(cfg)
    loss_obj = PSLDScoreLoss(cfg, sde)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3), jnp.float32)
    t = jnp.full((4,), 0.5, jnp.float64)
    rng = jax.random.PRNGKey(1)
    # replicate the internal eps draw
    _, k_eps = jax.random.split(rng)
    eps = jax.random.normal(k_eps, (4, 8, 8, 6), jnp.float32)
    loss = loss_obj(x0, t, lambda z, tt: eps, rng)
    assert float(loss) == 0.0


def test_psld_loss_positive_and_differentiable():
    cfg = psld_config()
    sde = PSLD(cfg)
    loss_obj = PSLDScoreLoss(cfg, sde)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3), jnp.float32)
    t = jnp.full((4,), 0.5, jnp.float64)
    w = jnp.ones((6,), jnp.float32)

    def f(w):
        return loss_obj(x0, t, lambda z, tt: z * w, jax.random.PRNGKey(1))

    val, grad = jax.value_and_grad(f)(w)
    assert float(val) > 0
    assert bool(jnp.isfinite(grad).all())


@pytest.mark.parametrize("mode", ["hsm", "dsm"])
def test_psld_loss_modes_run(mode):
    cfg = psld_config(mode=mode)
    sde = PSLD(cfg)
    loss_obj = PSLDScoreLoss(cfg, sde)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3), jnp.float32)
    t = jnp.asarray([0.2, 0.8], jnp.float64)
    loss = loss_obj(x0, t, lambda z, tt: jnp.zeros_like(z),
                    jax.random.PRNGKey(3))
    assert float(loss) > 0 and np.isfinite(float(loss))


def test_psld_loss_score_m_reduced_target():
    """gamma=0 + lower decomp: net predicts 3 channels, target is eps_m."""
    cfg = psld_config(nu=4.0, gamma=0.0)
    sde = PSLD(cfg)
    assert sde.mode == "score_m"
    loss_obj = PSLDScoreLoss(cfg, sde)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3), jnp.float32)
    t = jnp.asarray([0.3, 0.6], jnp.float64)
    # net returns only 3 channels
    loss = loss_obj(x0, t, lambda z, tt: z[..., 3:] * 0.0,
                    jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


def test_vpsde_score_loss_fid_and_nll():
    for weighting in ("fid", "nll"):
        cfg = vpsde_config(weighting)
        sde = VPSDE(cfg)
        loss_obj = ScoreLoss(cfg, sde)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 3),
                               jnp.float32)
        t = jnp.full((4,), 0.5, jnp.float64)
        loss = loss_obj(x0, t, lambda z, tt: jnp.zeros_like(z),
                        jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)) and float(loss) > 0


def test_tce_loss_returns_loss_and_acc():
    cfg = ConfigDict({
        "diffusion": psld_config().to_dict(),
        "clf": {"training": {"loss": {"l_type": "l2", "reduce_mean": True}}},
    })
    sde = PSLD(cfg.diffusion)
    loss_obj = PSLDTimeCELoss(cfg, sde)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3), jnp.float32)
    y = jnp.arange(8) % 3

    def clf_fn(z, t):
        # classifier that always predicts class 0
        logits = jnp.zeros((z.shape[0], 3))
        return logits.at[:, 0].set(5.0)

    loss, acc = loss_obj(x0, y, jnp.full((8,), 0.5, jnp.float64), clf_fn,
                         jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(acc), 3 / 8)
