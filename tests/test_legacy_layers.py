"""Legacy NCSNv1/v2 layer tests (reference layers.py:118-492): shapes,
finiteness, and pooling/resize oracles vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from psld_tpu.models import legacy_layers as L


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


def run(mod, *args):
    params = mod.init(jax.random.PRNGKey(0), *args)
    return mod.apply(params, *args)


def test_crp_and_rcu_blocks():
    x = rand((2, 8, 8, 16))
    for maxpool in (True, False):
        out = run(L.CRPBlock(16, 2, maxpool=maxpool), x)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    out = run(L.RCUBlock(16, 2, 2), x)
    assert out.shape == x.shape


def test_msf_and_refine_blocks():
    xs = [rand((2, 8, 8, 16), 1), rand((2, 4, 4, 32), 2)]
    out = run(L.MSFBlock(24), xs, (8, 8))
    assert out.shape == (2, 8, 8, 24)
    out = run(L.RefineBlock(24, end=True), xs, (8, 8))
    assert out.shape == (2, 8, 8, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_cond_refine_block():
    xs = [rand((2, 8, 8, 16), 3), rand((2, 4, 4, 32), 4)]
    y = jnp.asarray([0, 2])
    mod = L.CondRefineBlock(24, num_classes=3)
    params = mod.init(jax.random.PRNGKey(0), xs, y, (8, 8))
    out = mod.apply(params, xs, y, (8, 8))
    assert out.shape == (2, 8, 8, 24)
    out2 = mod.apply(params, xs, jnp.asarray([1, 1]), (8, 8))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_bilinear_align_corners_matches_torch():
    x = rand((1, 4, 4, 3), 5)
    got = np.asarray(L._resize_bilinear_align_corners(x, (7, 9)))
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    want = F.interpolate(xt, size=(7, 9), mode="bilinear",
                         align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mean_pool_convs():
    x = rand((2, 8, 8, 4), 6)
    assert run(L.ConvMeanPool(6), x).shape == (2, 4, 4, 6)
    assert run(L.MeanPoolConv(6), x).shape == (2, 4, 4, 6)
    assert run(L.UpsampleConv(6), x).shape == (2, 16, 16, 6)
    # the reference's cat([x]*4)+PixelShuffle(2) scrambles channels for
    # C > 1; verify the faithful reproduction against torch
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    ps = torch.nn.functional.pixel_shuffle(torch.cat([xt] * 4, dim=1), 2)
    want = ps.numpy().transpose(0, 2, 3, 1)
    b, h, w, c = x.shape
    cat = np.concatenate([np.asarray(x)] * 4, axis=-1)
    t = cat.reshape(b, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    got = t.reshape(b, 2 * h, 2 * w, c)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_residual_blocks():
    x = rand((2, 8, 8, 16), 7)
    assert run(L.ResidualBlock(16), x).shape == (2, 8, 8, 16)
    assert run(L.ResidualBlock(32), x).shape == (2, 8, 8, 32)
    assert run(L.ResidualBlock(32, resample="down"), x).shape == (2, 4, 4, 32)
    assert run(L.ResidualBlock(32, dilation=2), x).shape == (2, 8, 8, 32)
    # non-default normalization factories must receive the channel count
    # (reference layers.py:443-449)
    from psld_tpu.models.normalization import InstanceNorm2dPlus, VarianceNorm2d

    assert run(L.ResidualBlock(32, normalization=InstanceNorm2dPlus),
               x).shape == (2, 8, 8, 32)
    assert run(L.ResidualBlock(32, resample="down",
                               normalization=VarianceNorm2d),
               x).shape == (2, 4, 4, 32)
    y = jnp.asarray([0, 1])
    mod = L.ConditionalResidualBlock(32, num_classes=2, resample="down")
    params = mod.init(jax.random.PRNGKey(0), x, y)
    assert mod.apply(params, x, y).shape == (2, 4, 4, 32)
