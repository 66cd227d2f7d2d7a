"""NCSNv1/v2 legacy layer zoo (reference song_sde/layers.py:118-492), NHWC.

These RefineNet-style blocks are carried by the reference layer library but
unused by NCSN++ and by every reference entry point (SURVEY.md section 2,
item 21). Provided for component parity and for building NCSNv1/v2-style
score nets on TPU. Conditional variants take a class-label vector ``y`` and
a normalizer factory from :mod:`psld_tpu.models.normalization`.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from psld_tpu.models.normalization import (
    ConditionalInstanceNorm2dPlus,
    InstanceNorm2d,
)


def ncsn_conv3x3(out_ch: int, *, bias: bool = True, dilation: int = 1,
                 init_scale: float = 1.0) -> nn.Conv:
    """3x3 conv with torch-default init scaled by init_scale
    (reference layers.py:93-100); flax default init is close enough for
    these legacy blocks -- the scale knob is what matters."""
    init_scale = 1e-10 if init_scale == 0 else init_scale

    def kernel_init(key, shape, dtype=jnp.float32):
        base = nn.initializers.lecun_normal()(key, shape, dtype)
        return base * init_scale

    return nn.Conv(out_ch, (3, 3), kernel_dilation=(dilation, dilation),
                   padding=[(dilation, dilation)] * 2, use_bias=bias,
                   kernel_init=kernel_init)


def ncsn_conv1x1(out_ch: int, *, bias: bool = True) -> nn.Conv:
    return nn.Conv(out_ch, (1, 1), use_bias=bias)


def _pool5(x, kind: str):
    """5x5 stride-1 pad-2 pooling (CRP inner pool)."""
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            ((0, 0), (2, 2), (2, 2), (0, 0)))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        ((0, 0), (2, 2), (2, 2), (0, 0)))
    return summed / 25.0  # torch AvgPool2d counts padded zeros


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:118-139)."""

    features: int
    n_stages: int
    act: Callable = jax.nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = _pool5(path, "max" if self.maxpool else "avg")
            path = ncsn_conv3x3(self.features, bias=False)(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """(layers.py:142-165); always avg-pool."""

    features: int
    n_stages: int
    num_classes: int
    normalizer: Callable = ConditionalInstanceNorm2dPlus
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = self.normalizer(features=self.features,
                                   num_classes=self.num_classes)(path, y)
            path = _pool5(path, "avg")
            path = ncsn_conv3x3(self.features, bias=False)(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (layers.py:168-188)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = ncsn_conv3x3(self.features, bias=False)(self.act(x))
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """(layers.py:191-216)"""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Callable = ConditionalInstanceNorm2dPlus
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, y):
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.normalizer(features=x.shape[-1],
                                    num_classes=self.num_classes)(x, y)
                x = ncsn_conv3x3(self.features, bias=False)(self.act(x))
            x = x + residual
        return x


def _resize_bilinear_align_corners(x, shape):
    """F.interpolate(..., align_corners=True) parity."""
    b, h, w, c = x.shape
    oh, ow = shape
    if (h, w) == (oh, ow):
        return x
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class MSFBlock(nn.Module):
    """Multi-scale fusion (layers.py:219-235)."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], shape):
        total = jnp.zeros((xs[0].shape[0], shape[0], shape[1],
                           self.features), xs[0].dtype)
        for x in xs:
            h = ncsn_conv3x3(self.features, bias=True)(x)
            total = total + _resize_bilinear_align_corners(h, shape)
        return total


class CondMSFBlock(nn.Module):
    """(layers.py:238-259)"""

    features: int
    num_classes: int
    normalizer: Callable = ConditionalInstanceNorm2dPlus

    @nn.compact
    def __call__(self, xs, y, shape):
        total = jnp.zeros((xs[0].shape[0], shape[0], shape[1],
                           self.features), xs[0].dtype)
        for x in xs:
            h = self.normalizer(features=x.shape[-1],
                                num_classes=self.num_classes)(x, y)
            h = ncsn_conv3x3(self.features, bias=True)(h)
            total = total + _resize_bilinear_align_corners(h, shape)
        return total


class RefineBlock(nn.Module):
    """RefineNet block (layers.py:262-293)."""

    features: int
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], output_shape):
        hs = [RCUBlock(x.shape[-1], 2, 2, self.act)(x) for x in xs]
        if len(xs) > 1:
            h = MSFBlock(self.features)(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool)(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act)(h)


class CondRefineBlock(nn.Module):
    """(layers.py:296-333)"""

    features: int
    num_classes: int
    normalizer: Callable = ConditionalInstanceNorm2dPlus
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs, y, output_shape):
        hs = [CondRCUBlock(x.shape[-1], 2, 2, self.num_classes,
                           self.normalizer, self.act)(x, y) for x in xs]
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.num_classes,
                             self.normalizer)(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes,
                         self.normalizer, self.act)(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.num_classes, self.normalizer, self.act)(h, y)


def _mean_pool_2x2(x):
    return (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2]
            + x[:, 1::2, 1::2]) / 4.0


class ConvMeanPool(nn.Module):
    """conv then 2x2 mean pool (layers.py:337-356)."""

    out_ch: int
    kernel_size: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        p = self.kernel_size // 2
        h = nn.Conv(self.out_ch, (self.kernel_size,) * 2,
                    padding=[(p, p), (p, p)], use_bias=self.biases)(x)
        return _mean_pool_2x2(h)


class MeanPoolConv(nn.Module):
    """2x2 mean pool then conv (layers.py:359-368)."""

    out_ch: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        return nn.Conv(self.out_ch, (self.kernel_size,) * 2,
                       padding=[(p, p), (p, p)],
                       use_bias=self.biases)(_mean_pool_2x2(x))


class UpsampleConv(nn.Module):
    """Pixel-shuffle x2 upsample then conv (layers.py:371-381)."""

    out_ch: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # faithful cat([x]*4) + PixelShuffle(2): for c > 1 this *scrambles*
        # channels (out channel k reads input channel (4k+2di+dj) mod c) --
        # a quirk of the reference, reproduced exactly
        cat = jnp.concatenate([x] * 4, axis=-1)
        t = cat.reshape(b, h, w, c, 2, 2)
        t = t.transpose(0, 1, 4, 2, 5, 3)
        up = t.reshape(b, 2 * h, 2 * w, c)
        p = self.kernel_size // 2
        return nn.Conv(self.out_ch, (self.kernel_size,) * 2,
                       padding=[(p, p), (p, p)], use_bias=self.biases)(up)


class ResidualBlock(nn.Module):
    """NCSNv2 residual block (layers.py:438-492)."""

    out_ch: int
    resample: str | None = None
    act: Callable = jax.nn.elu
    dilation: int = 1
    adjust_padding: bool = False
    normalization: Callable = InstanceNorm2d

    def _norm(self, h):
        # the reference instantiates the factory with the channel count
        # (normalization(input_dim), layers.py:443-449)
        return self.normalization(features=h.shape[-1])(h)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = self.act(self._norm(x))
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(in_ch, dilation=self.dilation)(h)
                h = self.act(self._norm(h))
                h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
                shortcut = ncsn_conv3x3(self.out_ch,
                                        dilation=self.dilation)(x)
            else:
                h = ncsn_conv3x3(in_ch)(h)
                h = self.act(self._norm(h))
                h = ConvMeanPool(self.out_ch, 3,
                                 adjust_padding=self.adjust_padding)(h)
                shortcut = ConvMeanPool(self.out_ch, 1,
                                        adjust_padding=self.adjust_padding)(x)
        elif self.resample is None:
            h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
            h = self.act(self._norm(h))
            h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
            if self.out_ch == in_ch:
                shortcut = x
            elif self.dilation > 1:
                shortcut = ncsn_conv3x3(self.out_ch,
                                        dilation=self.dilation)(x)
            else:
                shortcut = ncsn_conv1x1(self.out_ch)(x)
        else:
            raise ValueError("invalid resample value")
        return shortcut + h


class ConditionalResidualBlock(nn.Module):
    """(layers.py:384-435)"""

    out_ch: int
    num_classes: int
    resample: str | None = None
    act: Callable = jax.nn.elu
    dilation: int = 1
    adjust_padding: bool = False
    normalization: Callable = ConditionalInstanceNorm2dPlus

    @nn.compact
    def __call__(self, x, y):
        in_ch = x.shape[-1]

        def norm(feat):
            return self.normalization(features=feat,
                                      num_classes=self.num_classes)

        h = self.act(norm(in_ch)(x, y))
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(in_ch, dilation=self.dilation)(h)
                h = self.act(norm(in_ch)(h, y))
                h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
                shortcut = ncsn_conv3x3(self.out_ch,
                                        dilation=self.dilation)(x)
            else:
                h = ncsn_conv3x3(in_ch)(h)
                h = self.act(norm(in_ch)(h, y))
                h = ConvMeanPool(self.out_ch, 3,
                                 adjust_padding=self.adjust_padding)(h)
                shortcut = ConvMeanPool(self.out_ch, 1,
                                        adjust_padding=self.adjust_padding)(x)
        elif self.resample is None:
            h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
            h = self.act(norm(self.out_ch)(h, y))
            h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
            if self.out_ch == in_ch:
                shortcut = x
            elif self.dilation > 1:
                shortcut = ncsn_conv3x3(self.out_ch,
                                        dilation=self.dilation)(x)
            else:
                shortcut = ncsn_conv1x1(self.out_ch)(x)
        else:
            raise ValueError("invalid resample value")
        return shortcut + h
