"""Normalization variants (reference song_sde/normalization.py, NHWC/flax).

NCSN++ itself uses plain GroupNorm inline (layerspp.py:67-68); these NCSNv1/
v2-era conditional/instance variants exist in the reference layer library
and are provided for component parity. Variance/instance statistics reduce
over the spatial axes (1, 2) in NHWC.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-5


def _instance_norm(x):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _EPS)


def _normal_init(mean=1.0, std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def _plus_stats(x):
    """Cross-channel normalization of per-(sample, channel) means
    (the 'InstanceNorm++' correction). ddof=1: the reference uses
    torch.var's unbiased default (normalization.py:173, 203)."""
    means = x.mean(axis=(1, 2))                      # [B, C]
    m = means.mean(axis=-1, keepdims=True)
    v = means.var(axis=-1, keepdims=True, ddof=1)
    return (means - m) * jax.lax.rsqrt(v + _EPS)     # [B, C]


class InstanceNorm2d(nn.Module):
    """Plain instance norm (affine=False parity with nn.InstanceNorm2d).
    ``features`` is accepted for factory-signature parity with the other
    variants (reference passes the channel count, layers.py:443)."""

    features: int = 0

    @nn.compact
    def __call__(self, x):
        return _instance_norm(x)


class VarianceNorm2d(nn.Module):
    """x / spatial std with a learned scale ~ N(1, 0.02)
    (normalization.py:111-123)."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", _normal_init(), (self.features,))
        # unbiased: reference torch.var default (normalization.py:119)
        var = x.var(axis=(1, 2), keepdims=True, ddof=1)
        return alpha * x * jax.lax.rsqrt(var + _EPS)


class NoneNorm2d(nn.Module):
    """(normalization.py:149-154)"""

    features: int = 0

    @nn.compact
    def __call__(self, x):
        return x


class InstanceNorm2dPlus(nn.Module):
    """Instance norm + cross-channel mean correction
    (normalization.py:157-183)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        means = _plus_stats(x)[:, None, None, :]
        h = _instance_norm(x)
        alpha = self.param("alpha", _normal_init(), (self.features,))
        gamma = self.param("gamma", _normal_init(), (self.features,))
        h = h + means * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            out = out + beta
        return out


class _ClassEmbed(nn.Module):
    """Per-class (gain, bias, ...) table."""

    num_classes: int
    width: int
    init: object

    @nn.compact
    def __call__(self, y):
        table = self.param("embedding", self.init,
                           (self.num_classes, self.width))
        return table[y]


class ConditionalBatchNorm2d(nn.Module):
    """(normalization.py:43-66); batch stats computed per call (the legacy
    reference path never runs inference with running stats)."""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        mean = x.mean(axis=(0, 1, 2), keepdims=True)
        var = x.var(axis=(0, 1, 2), keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + _EPS)
        return _apply_class_affine(self, h, y, self.features,
                                   self.num_classes, self.bias)


class ConditionalInstanceNorm2d(nn.Module):
    """(normalization.py:69-92)"""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        h = _instance_norm(x)
        return _apply_class_affine(self, h, y, self.features,
                                   self.num_classes, self.bias)


class ConditionalVarianceNorm2d(nn.Module):
    """(normalization.py:95-108)"""

    features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, y):
        # unbiased: reference torch.var default (normalization.py:102)
        var = x.var(axis=(1, 2), keepdims=True, ddof=1)
        h = x * jax.lax.rsqrt(var + _EPS)
        gamma = _ClassEmbed(self.num_classes, self.features,
                            _normal_init())(y)
        return gamma[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """(normalization.py:126-146)"""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        return _apply_class_affine(self, x, y, self.features,
                                   self.num_classes, self.bias)


def _apply_class_affine(module, h, y, features, num_classes, bias):
    if bias:
        def init(key, shape, dtype=jnp.float32):
            gain = jax.random.uniform(key, (shape[0], features), dtype)
            return jnp.concatenate(
                [gain, jnp.zeros((shape[0], features), dtype)], axis=-1)

        gb = _ClassEmbed(num_classes, 2 * features, init)(y)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma[:, None, None, :] * h + beta[:, None, None, :]
    gamma = _ClassEmbed(num_classes, features,
                        nn.initializers.uniform(scale=1.0))(y)
    return gamma[:, None, None, :] * h


class ConditionalInstanceNorm2dPlus(nn.Module):
    """(normalization.py:186-215)"""

    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        means = _plus_stats(x)[:, None, None, :]
        h = _instance_norm(x)
        if self.bias:
            def init(key, shape, dtype=jnp.float32):
                ga = _normal_init()(key, (shape[0], 2 * self.features), dtype)
                return jnp.concatenate(
                    [ga, jnp.zeros((shape[0], self.features), dtype)],
                    axis=-1)

            gab = _ClassEmbed(self.num_classes, 3 * self.features, init)(y)
            gamma, alpha, beta = jnp.split(gab, 3, axis=-1)
            h = h + means * alpha[:, None, None, :]
            return (gamma[:, None, None, :] * h + beta[:, None, None, :])
        ga = _ClassEmbed(self.num_classes, 2 * self.features,
                         _normal_init())(y)
        gamma, alpha = jnp.split(ga, 2, axis=-1)
        h = h + means * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


def get_normalization(config, conditional: bool = False):
    """Dispatch by config.model.normalization (normalization.py:22-40)."""
    norm = config.model.normalization
    if conditional:
        if norm == "InstanceNorm++":
            return partial(ConditionalInstanceNorm2dPlus,
                           num_classes=config.model.num_classes)
        raise NotImplementedError(f"{norm} not implemented yet.")
    if norm == "InstanceNorm":
        return lambda features: InstanceNorm2d()
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        return lambda features: nn.GroupNorm(
            num_groups=min(features // 4, 32), epsilon=1e-6)
    raise ValueError(f"Unknown normalization: {norm}")
