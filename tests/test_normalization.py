"""Normalization-variant tests vs torch oracles (reference
song_sde/normalization.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from psld_tpu.models import normalization as norms


def rand(shape, seed=0):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32))


def test_instance_norm_matches_torch():
    x = rand((2, 6, 6, 4))
    got = np.asarray(norms.InstanceNorm2d().apply({}, jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.instance_norm(xt, eps=1e-5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_variance_norm_matches_torch_var():
    x = rand((2, 6, 6, 4), seed=1)
    mod = norms.VarianceNorm2d(features=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    alpha = np.asarray(params["params"]["alpha"])
    # torch.var default is unbiased (reference normalization.py:119)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    var = torch.var(xt, dim=(2, 3), keepdim=True).numpy().transpose(0, 2, 3, 1)
    want = alpha * x / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_plus_matches_torch():
    x = rand((3, 8, 8, 6), seed=2)
    mod = norms.InstanceNorm2dPlus(features=6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == x.shape

    # torch oracle transcribing reference normalization.py:171-182
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    means = torch.mean(xt, dim=(2, 3))
    m = torch.mean(means, dim=-1, keepdim=True)
    v = torch.var(means, dim=-1, keepdim=True)  # unbiased
    means = (means - m) / torch.sqrt(v + 1e-5)
    h = F.instance_norm(xt, eps=1e-5)
    alpha = torch.from_numpy(np.asarray(params["params"]["alpha"]))
    gamma = torch.from_numpy(np.asarray(params["params"]["gamma"]))
    beta = torch.from_numpy(np.asarray(params["params"]["beta"]))
    h = h + means[..., None, None] * alpha[..., None, None]
    want = (gamma.view(1, 6, 1, 1) * h + beta.view(1, 6, 1, 1)).numpy()
    np.testing.assert_allclose(out, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_conditional_variants_apply():
    x = jnp.asarray(rand((4, 8, 8, 6), seed=3))
    y = jnp.asarray([0, 1, 2, 1])
    for cls in (norms.ConditionalInstanceNorm2d,
                norms.ConditionalInstanceNorm2dPlus,
                norms.ConditionalVarianceNorm2d,
                norms.ConditionalNoneNorm2d,
                norms.ConditionalBatchNorm2d):
        kwargs = {"features": 6, "num_classes": 3}
        mod = cls(**kwargs)
        params = mod.init(jax.random.PRNGKey(0), x, y)
        out = mod.apply(params, x, y)
        assert out.shape == x.shape, cls.__name__
        assert np.isfinite(np.asarray(out)).all(), cls.__name__
        # different class labels give different outputs (conditionality)
        out2 = mod.apply(params, x, jnp.asarray([2, 0, 1, 0]))
        assert not np.allclose(np.asarray(out), np.asarray(out2)), (
            cls.__name__)


def test_get_normalization_dispatch():
    from psld_tpu.config import ConfigDict

    for name, needs_feat in (("GroupNorm", True), ("InstanceNorm", True),
                             ("InstanceNorm++", True), ("VarianceNorm", True)):
        cfg = ConfigDict({"model": {"normalization": name, "num_classes": 3}})
        factory = norms.get_normalization(cfg)
        mod = factory(8)
        x = jnp.asarray(rand((2, 4, 4, 8), seed=5))
        params = mod.init(jax.random.PRNGKey(0), x)
        assert mod.apply(params, x).shape == x.shape
    cfg = ConfigDict({"model": {"normalization": "InstanceNorm++",
                                "num_classes": 3}})
    cond = norms.get_normalization(cfg, conditional=True)(features=8)
    x = jnp.asarray(rand((2, 4, 4, 8), seed=6))
    params = cond.init(jax.random.PRNGKey(0), x, jnp.asarray([0, 1]))
    assert cond.apply(params, x, jnp.asarray([0, 1])).shape == x.shape
