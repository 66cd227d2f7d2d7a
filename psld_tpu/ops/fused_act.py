"""Fused bias-add + LeakyReLU (+ gain) elementwise op.

TPU-native equivalent of the reference's ``fused_bias_act`` CUDA kernel
(song_sde/op/fused_bias_act_kernel.cu, op/fused_act.py:74-97): a Pallas VPU
kernel with a custom VJP, plus a pure-jnp fallback mirroring the reference's
CPU path (op/fused_act.py:87-94). The reference compiles this kernel at
import but never calls it from any model; it exists here for component
parity and as the fused epilogue available to StyleGAN2-style nets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 512


def _fwd_kernel(x_ref, b_ref, o_ref, *, slope: float, scale: float):
    y = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(y >= 0, y, y * slope) * scale


def _bwd_kernel(x_ref, b_ref, g_ref, dx_ref, *, slope: float, scale: float):
    y = x_ref[:] + b_ref[:]
    dx_ref[:] = g_ref[:] * jnp.where(y >= 0, scale, slope * scale)


def _pad_rows(x2d: jax.Array) -> tuple[jax.Array, int]:
    n = x2d.shape[0]
    pad = (-n) % _ROW_TILE
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d, n


def _run_elementwise(kernel, out_dtype, *arrays):
    """Launch an elementwise Pallas kernel over row-tiles of (N, C) arrays."""
    padded = []
    n = arrays[0].shape[0]
    for a in arrays:
        a2, _ = _pad_rows(a)
        padded.append(a2)
    rows = padded[0].shape[0]
    c = padded[0].shape[1]
    grid = (rows // _ROW_TILE,)
    spec = pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        grid=grid,
        in_specs=[spec] * len(padded),
        out_specs=spec,
    )(*padded)
    return out[:n]


def _jnp_fused_leaky_relu(x, bias, slope, scale):
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return jnp.where(y >= 0, y, y * slope) * scale


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_leaky_relu(x: jax.Array, bias: jax.Array, slope: float = 0.2,
                     scale: float = 2**0.5, use_pallas: bool | None = None):
    """``leaky_relu(x + bias[channel]) * scale`` (NHWC; bias on last axis).

    Reference semantics: op/fused_act.py:87-94. ``use_pallas=None`` picks the
    Pallas kernel on TPU backends and the jnp fallback elsewhere.
    """
    return _fused_forward(x, bias, slope, scale, use_pallas)


def _should_use_pallas(use_pallas):
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu"


def _fused_forward(x, bias, slope, scale, use_pallas):
    if not _should_use_pallas(use_pallas):
        return _jnp_fused_leaky_relu(x, bias, slope, scale)
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    b2 = jnp.broadcast_to(bias.astype(x.dtype)[None, :], x2.shape)
    out = _run_elementwise(
        partial(_fwd_kernel, slope=slope, scale=scale), x.dtype, x2, b2
    )
    return out.reshape(shape)


def _fused_fwd(x, bias, slope, scale, use_pallas):
    return _fused_forward(x, bias, slope, scale, use_pallas), (x, bias)


def _fused_bwd(slope, scale, use_pallas, res, g):
    x, bias = res
    if _should_use_pallas(use_pallas):
        c = x.shape[-1]
        x2 = x.reshape(-1, c)
        b2 = jnp.broadcast_to(bias.astype(x.dtype)[None, :], x2.shape)
        g2 = g.reshape(-1, c)
        dx = _run_elementwise(
            partial(_bwd_kernel, slope=slope, scale=scale), x.dtype, x2, b2, g2
        ).reshape(x.shape)
    else:
        y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
        dx = g * jnp.where(y >= 0, scale, slope * scale).astype(g.dtype)
    db = dx.sum(axis=tuple(range(x.ndim - 1))).astype(bias.dtype)
    return dx, db


fused_leaky_relu.defvjp(_fused_fwd, _fused_bwd)
