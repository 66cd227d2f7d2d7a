"""Tests for ops.dropout (hardware-PRNG, regenerate-in-backward dropout).

The Pallas TPU PRNG primitives have no interpret-mode lowering in this
JAX, so on the CPU mesh these tests drive the jnp fallback, which shares
the custom-VJP structure (mask regenerated from the seed in the backward
rule, never saved). Kernel-vs-fallback agreement on statistics and the
fwd/bwd mask identity are additionally asserted on-chip by
``scripts/tpu_mfu_experiments.py`` phase ``dropout_pallas``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.ops.dropout import hw_dropout


def _seed(i=0):
    return jax.random.key_data(jax.random.PRNGKey(i)).reshape(-1).astype(
        jnp.uint32)


def test_deterministic_and_unbiased():
    x = jnp.ones((64, 128), jnp.float32)
    y1 = hw_dropout(x, _seed(1), 0.15)
    y2 = hw_dropout(x, _seed(1), 0.15)
    assert (np.asarray(y1) == np.asarray(y2)).all()
    # inverted scaling: kept entries are x/keep, dropped are 0
    vals = np.unique(np.asarray(y1))
    np.testing.assert_allclose(
        sorted(vals), [0.0, 1.0 / 0.85], rtol=1e-6)
    drop_frac = float((np.asarray(y1) == 0).mean())
    assert abs(drop_frac - 0.15) < 0.02
    # unbiased in expectation
    assert abs(float(y1.mean()) - 1.0) < 0.05


def test_seeds_decorrelate():
    x = jnp.ones((64, 128), jnp.float32)
    m1 = np.asarray(hw_dropout(x, _seed(1), 0.5)) != 0
    m2 = np.asarray(hw_dropout(x, _seed(2), 0.5)) != 0
    agree = float((m1 == m2).mean())
    assert 0.4 < agree < 0.6  # independent masks agree ~50% at rate .5


def test_grad_is_regenerated_mask():
    """d/dx sum(dropout(x)) must equal mask/keep with the SAME mask the
    forward used — the regenerate-in-backward contract."""
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
    seed = _seed(3)
    y, grad = jax.value_and_grad(
        lambda h: hw_dropout(h, seed, 0.3).sum())(x)
    fwd = np.asarray(hw_dropout(x, seed, 0.3))
    g = np.asarray(grad)
    kept = fwd != 0
    np.testing.assert_allclose(g[kept], 1.0 / 0.7, rtol=1e-6)
    np.testing.assert_allclose(g[~kept], 0.0)


def test_grad_through_jit_and_bf16():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 128), jnp.bfloat16)
    seed = _seed(4)

    @jax.jit
    def loss(h):
        return hw_dropout(h, seed, 0.15).astype(jnp.float32).sum()

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16
    vals = set(np.unique(np.asarray(g, np.float32)))
    scale_bf16 = float(jnp.bfloat16(1 / 0.85))
    assert vals <= {0.0, scale_bf16}


def test_module_dispatch_and_shape_passthrough(monkeypatch):
    from psld_tpu.models.layers import dropout_layer
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return dropout_layer(x, 0.25, train)

    monkeypatch.setenv("PSLD_DROPOUT_PALLAS", "1")
    net = Net()
    x = jnp.ones((2, 8, 8, 64), jnp.float32)
    y = net.apply({}, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(7)})
    assert y.shape == x.shape
    assert 0.10 < float((np.asarray(y) == 0).mean()) < 0.40
    # eval mode: identity
    y_eval = net.apply({}, x, train=False)
    assert (np.asarray(y_eval) == np.asarray(x)).all()


def test_rate_edge_cases():
    x = jnp.ones((4, 128), jnp.float32)
    from psld_tpu.models.layers import HWDropout
    ident = HWDropout(0.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    assert (np.asarray(ident) == 1.0).all()
    allzero = HWDropout(1.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    assert (np.asarray(allzero) == 0.0).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU PRNG needs a real TPU")
def test_pallas_kernel_on_chip():
    x = jnp.ones((256, 128), jnp.bfloat16)
    seed = _seed(5)
    y = hw_dropout(x, seed, 0.15, True)
    g = jax.grad(lambda h: hw_dropout(
        h, seed, 0.15, True).astype(jnp.float32).sum())(x)
    ya, ga = np.asarray(y, np.float32), np.asarray(g, np.float32)
    assert abs(float((ya == 0).mean()) - 0.15) < 0.03
    # fwd/bwd regenerate the SAME mask
    assert ((ya == 0) == (ga == 0)).all()
