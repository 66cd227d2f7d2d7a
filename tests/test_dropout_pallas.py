"""Tests for ops.dropout (counter-hash, regenerate-in-backward dropout).

On the CPU mesh these tests drive the jnp path, which computes the SAME
hash bits as the Pallas kernel (one formula, two lowerings) — so the
mask math, the custom-VJP structure, and the custom_partitioning global
-offset logic are all pinned here; kernel-vs-jnp bitwise agreement is
asserted on-chip (``test_pallas_kernel_on_chip``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def test_rate_guards():
    x = jnp.ones((4, 128), jnp.float32)
    with pytest.raises(ValueError, match="rate"):
        hw_dropout(x, _seed(0), 1.5)
    with pytest.raises(ValueError, match="rate"):
        hw_dropout(x, _seed(0), -0.1)
    # rate=1.0: all-zero output AND all-zero gradient, no ZeroDivision
    y, g = jax.value_and_grad(
        lambda h: hw_dropout(h, _seed(0), 1.0).sum())(x)
    assert float(y) == 0.0 and (np.asarray(g) == 0.0).all()
    # rate=0.0: identity with identity gradient
    g0 = jax.grad(lambda h: hw_dropout(h, _seed(0), 0.0).sum())(x)
    assert (np.asarray(g0) == 1.0).all()


def test_extra_seed_words_decorrelate():
    """4-word keys (rbg) differing only in their LAST words must produce
    different masks — every word folds into the stream (advisor r3)."""
    x = jnp.ones((64, 128), jnp.float32)
    s_a = jnp.asarray([1, 2, 3, 4], jnp.uint32)
    s_b = jnp.asarray([1, 2, 5, 6], jnp.uint32)
    m_a = np.asarray(hw_dropout(x, s_a, 0.5)) != 0
    m_b = np.asarray(hw_dropout(x, s_b, 0.5)) != 0
    agree = float((m_a == m_b).mean())
    assert 0.4 < agree < 0.6


def _mesh1d():
    return Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))


def test_sharded_mask_is_layout_invariant():
    """The custom_partitioning rule: masks (and grads) on ANY mesh layout
    must be BIT-IDENTICAL to the unsharded op — the global-flat-offset
    contract that also guarantees fwd/bwd mask agreement under SPMD."""
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 128),
                          jnp.float32)
    seed = _seed(6)
    ref = np.asarray(hw_dropout(x, seed, 0.3))
    gref = np.asarray(jax.grad(
        lambda h: (hw_dropout(h, seed, 0.3) ** 2).sum())(x))

    mesh = _mesh1d()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda h: hw_dropout(h, seed, 0.3))(xs)
    np.testing.assert_array_equal(np.asarray(out), ref)
    g = jax.jit(jax.grad(
        lambda h: (hw_dropout(h, seed, 0.3) ** 2).sum()))(xs)
    np.testing.assert_array_equal(np.asarray(g), gref)

    # 2-D (data, spatial) layout: inner-dim shards are resharded around
    # the op by the partitioner; the mask must not change
    devs = np.asarray(jax.devices())
    if devs.size % 2 == 0 and devs.size >= 4:
        mesh2 = Mesh(devs.reshape(devs.size // 2, 2), ("data", "spatial"))
        xs2 = jax.device_put(x, NamedSharding(mesh2, P("data", "spatial")))
        out2 = jax.jit(lambda h: hw_dropout(h, seed, 0.3))(xs2)
        np.testing.assert_array_equal(np.asarray(out2), ref)


def test_sharded_train_step_with_hw_dropout():
    """dropout_impl=hw inside the REAL jitted train step on the 8-device
    mesh: runs, and the loss matches the unsharded step bitwise (the
    advisor-r3 SPMD concern, closed by the partitioning rule)."""
    from psld_tpu.config import ConfigDict
    from psld_tpu.losses import PSLDScoreLoss
    from psld_tpu.models.ncsnpp import NCSNpp
    from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from psld_tpu.sde.psld import PSLD
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    cfg = ConfigDict({
        "data": {"image_size": 8, "num_channels": 1},
        "model": {
            "score_fn": {"name": "ncsnpp", "in_ch": 2, "out_ch": 2,
                         "nonlinearity": "swish", "nf": 8, "ch_mult": [1, 2],
                         "num_res_blocks": 1, "attn_resolutions": [4],
                         "dropout": 0.3, "resamp_with_conv": True,
                         "noise_cond": True, "fir": False,
                         "fir_kernel": [1, 3, 3, 1], "skip_rescale": True,
                         "resblock_type": "biggan", "progressive": "none",
                         "progressive_input": "none",
                         "progressive_combine": "sum",
                         "embedding_type": "fourier", "init_scale": 0.0,
                         "fourier_scale": 16, "dropout_impl": "hw"},
            "sde": {"name": "psld", "beta_min": 8, "beta_max": 8, "nu": 4.01,
                    "gamma": 0.01, "kappa": 0.04, "decomp_mode": "lower",
                    "numerical_eps": 1e-9, "n_timesteps": 1000},
        },
        "training": {"mode": "hsm", "train_eps": 1e-5, "use_ema": True,
                     "ema_decay": 0.999, "seed": 0,
                     "loss": {"name": "psld_score_loss", "l_type": "l2",
                              "reduce_mean": True, "weighting": "fid"},
                     "optimizer": {"name": "Adam", "lr": 1e-3, "beta_1": 0.9,
                                   "beta_2": 0.999, "weight_decay": 0,
                                   "eps": 1e-8, "warmup": 10,
                                   "grad_clip": 1.0}},
    })
    sde = PSLD(cfg)
    net = NCSNpp.from_config(cfg)
    assert net.dropout_impl == "hw"
    criterion = PSLDScoreLoss(cfg, sde)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 2)),
                      jnp.full((2,), 0.5, jnp.float32))
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=False)
    raw = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 1),
                            jnp.float32)

    mesh = make_mesh()
    state = replicate(init_state(params, optimizer), mesh)
    batch = shard_batch(raw, mesh)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    sharded_loss = float(metrics["loss"])

    state1 = init_state(params, optimizer)
    _, metrics1 = step_fn(state1, raw, jax.random.PRNGKey(2))
    # masks are bit-identical across layouts (previous test); the loss
    # only sees the usual cross-shard sum reorder (~1e-7 rel)
    assert abs(sharded_loss - float(metrics1["loss"])) < 1e-6 * abs(
        sharded_loss)


def test_resolve_dropout_impl(monkeypatch):
    from psld_tpu.models.layers import resolve_dropout_impl

    monkeypatch.delenv("PSLD_DROPOUT_PALLAS", raising=False)
    monkeypatch.delenv("PSLD_DROPOUT_REMAT", raising=False)
    assert resolve_dropout_impl() == "save_mask"
    assert resolve_dropout_impl("hw") == "hw"
    assert resolve_dropout_impl("remat") == "remat"
    with pytest.raises(ValueError, match="dropout_impl"):
        resolve_dropout_impl("bogus")
    monkeypatch.setenv("PSLD_DROPOUT_PALLAS", "1")
    assert resolve_dropout_impl("save_mask") == "hw"
    monkeypatch.setenv("PSLD_DROPOUT_PALLAS", "0")
    assert resolve_dropout_impl("hw") == "save_mask"
    monkeypatch.delenv("PSLD_DROPOUT_PALLAS")
    monkeypatch.setenv("PSLD_DROPOUT_REMAT", "1")
    assert resolve_dropout_impl("save_mask") == "remat"


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel needs a real TPU")
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
    # kernel and jnp path compute the SAME hash bits
    yj = np.asarray(hw_dropout(x, seed, 0.15, False), np.float32)
    np.testing.assert_array_equal(ya, yj)


def test_hw_inline_impl_dispatch():
    """dropout_impl=hw_inline: same counter-hash mask as hw, inline jnp
    lowering (use_pallas=False threaded through HWDropout); env kill
    switch PSLD_DROPOUT_PALLAS=0 downgrades it to save_mask too."""
    from psld_tpu.models.layers import HWDropout, resolve_dropout_impl

    assert resolve_dropout_impl("hw_inline") == "hw_inline"
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
    auto = HWDropout(0.3, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(1)})
    inline = HWDropout(0.3, deterministic=False, use_pallas=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(inline))
    os.environ["PSLD_DROPOUT_PALLAS"] = "0"
    try:
        assert resolve_dropout_impl("hw_inline") == "save_mask"
    finally:
        del os.environ["PSLD_DROPOUT_PALLAS"]
