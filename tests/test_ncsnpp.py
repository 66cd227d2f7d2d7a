"""NCSN++ model tests: forward shapes across the reference config matrix,
init statistics, gradient flow, classifier head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.models.ncsnpp import NCSNpp, NCSNppClassifier


def tiny_net(**kw):
    base = dict(image_size=16, in_ch=6, out_ch=6, nf=16, ch_mult=(1, 2),
                num_res_blocks=1, attn_resolutions=(8,), dropout=0.1)
    base.update(kw)
    return NCSNpp(**base)


def init_and_run(net, b=2, size=16, in_ch=6, train=False):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, size, size, in_ch),
                          jnp.float32)
    t = jnp.linspace(0.1, 0.9, b, dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)
    rngs = {"dropout": jax.random.PRNGKey(2)} if train else {}
    out = net.apply(params, x, t, train=train, rngs=rngs)
    return params, out


@pytest.mark.parametrize("resblock_type", ["biggan", "ddpm"])
@pytest.mark.parametrize("fir", [False, True])
def test_forward_shapes(resblock_type, fir):
    net = tiny_net(resblock_type=resblock_type, fir=fir)
    _, out = init_and_run(net)
    assert out.shape == (2, 16, 16, 6)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("progressive", ["none", "output_skip", "residual"])
def test_progressive_output(progressive):
    net = tiny_net(progressive=progressive, fir=True,
                   embedding_type="fourier")
    _, out = init_and_run(net)
    assert out.shape == (2, 16, 16, 6)


@pytest.mark.parametrize("progressive_input,combine", [
    ("input_skip", "cat"), ("input_skip", "sum"), ("residual", "sum"),
])
def test_progressive_input(progressive_input, combine):
    net = tiny_net(progressive_input=progressive_input,
                   progressive_combine=combine, fir=True)
    _, out = init_and_run(net)
    assert out.shape == (2, 16, 16, 6)


def test_sota_cifar_config_shapes():
    """The SOTA CIFAR-10 recipe (ch_mult=[2,2,2], 8 blocks, FIR, fourier,
    progressive_input=residual) at reduced nf."""
    net = NCSNpp(image_size=32, in_ch=6, out_ch=6, nf=32, ch_mult=(2, 2, 2),
                 num_res_blocks=2, attn_resolutions=(16,), fir=True,
                 embedding_type="fourier", progressive_input="residual",
                 dropout=0.15)
    _, out = init_and_run(net, b=2, size=32)
    assert out.shape == (2, 32, 32, 6)


def test_init_scale_zero_output_conv():
    """init_scale=0 zero-inits the output conv => near-zero initial output."""
    net = tiny_net()
    _, out = init_and_run(net)
    assert float(jnp.abs(out).max()) < 1e-4


def test_positional_vs_fourier_embedding_distinct():
    net_p = tiny_net(embedding_type="positional")
    net_f = tiny_net(embedding_type="fourier")
    p_p, _ = init_and_run(net_p)
    p_f, _ = init_and_run(net_f)
    flat_p = jax.tree_util.tree_leaves(p_p)
    flat_f = jax.tree_util.tree_leaves(p_f)
    # fourier path has the extra W param
    assert len(flat_f) == len(flat_p) + 1


def test_dropout_train_mode_stochastic():
    net = tiny_net(dropout=0.5, init_scale=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 6), jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)
    o1 = net.apply(params, x, t, train=True,
                   rngs={"dropout": jax.random.PRNGKey(10)})
    o2 = net.apply(params, x, t, train=True,
                   rngs={"dropout": jax.random.PRNGKey(11)})
    o3 = net.apply(params, x, t, train=False)
    o4 = net.apply(params, x, t, train=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4))


def test_gradients_flow_everywhere():
    net = tiny_net(fir=True, embedding_type="fourier",
                   progressive_input="residual")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 6), jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    def loss(p):
        return jnp.mean(net.apply(p, x, t) ** 2)

    grads = jax.grad(loss)(params)
    leaves_with_path = jax.tree_util.tree_leaves_with_path(grads)
    zero_grads = [jax.tree_util.keystr(path)
                  for path, g in leaves_with_path
                  if not np.isfinite(np.asarray(g)).all()]
    assert not zero_grads, zero_grads
    # the fourier W must receive zero gradient (frozen in the reference)
    w_grads = [g for path, g in leaves_with_path
               if "GaussianFourierProjection" in jax.tree_util.keystr(path)]
    assert w_grads and all(float(jnp.abs(g).max()) == 0.0 for g in w_grads)


def test_classifier_logits():
    clf = NCSNppClassifier(image_size=16, in_ch=6, nf=16, ch_mult=(1, 2),
                           num_res_blocks=1, attn_resolutions=(8,), n_cls=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 6), jnp.float32)
    t = jnp.full((4,), 0.3, jnp.float32)
    params = clf.init(jax.random.PRNGKey(1), x, t)
    logits = clf.apply(params, x, t)
    assert logits.shape == (4, 10)
    assert bool(jnp.isfinite(logits).all())


def test_param_count_scales_like_reference():
    """SOTA CIFAR-10 NCSN++ (nf=128, ch_mult=[2,2,2], 8 resblocks, FIR,
    fourier, progressive_input=residual) should land at the ~100M params
    the reference reports for this recipe."""
    net = NCSNpp(image_size=32, in_ch=6, out_ch=6, nf=128, ch_mult=(2, 2, 2),
                 num_res_blocks=8, attn_resolutions=(16,), fir=True,
                 embedding_type="fourier", progressive_input="residual",
                 dropout=0.15)
    x = jnp.zeros((1, 32, 32, 6), jnp.float32)
    t = jnp.full((1,), 0.5, jnp.float32)
    params = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, t))
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    assert 80e6 < n < 120e6, n
