"""Fused GroupNorm -> activation kernel (Pallas, TPU).

Every NCSN++ resblock opens with GroupNorm(min(C//4, 32)) followed by the
nonlinearity (reference layerspp.py:67-68, 183-186, 238-241); XLA compiles
the reduction and the normalize+act as separate HBM passes. This kernel
does the whole thing in one VMEM residency per batch element: group
statistics are computed with two tiny MXU matmuls against a (C, G)
group-partition matrix (no lane-dimension reshapes, which Mosaic handles
poorly), then normalize + affine + activation on the VPU.

Differentiable via a custom VJP whose backward pulls back through the jnp
reference chain (exact, and cheap next to the surrounding convs). The jnp
reference (`group_norm_act_reference`) serves CPU and unfriendly shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "none": lambda x: x,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}


def group_norm_act_reference(x, scale, bias, num_groups: int,
                             eps: float = 1e-6, act: str = "none"):
    """NHWC GroupNorm (biased variance, matching nn.GroupNorm) + act.

    ``PSLD_GN_BF16=1`` / ``model.score_fn.gn_bf16=true`` (knobs.gn_bf16)
    runs the normalize+affine+act ELEMENTWISE chain in the input dtype for
    non-f32 inputs instead of f32 — the 256px-roof experiment lever
    (round-4 verdict weak #1: "the 256px graph keeps f32 GN/FIR
    intermediates XLA does not downcast"). Moment sums stay f32 always:
    the E[x^2]-E[x]^2 cancellation loses too many bf16 mantissa bits."""
    from psld_tpu import knobs

    b, h, w, c = x.shape
    g = num_groups
    cd = x.dtype if (x.dtype != jnp.float32 and knobs.gn_bf16()) \
        else jnp.float32
    xg = x.reshape(b, h * w, g, c // g)
    x32 = xg.astype(jnp.float32)
    # single-pass moments (matching flax _compute_stats): two-pass
    # E[(x-mean)^2] materializes the centered tensor in HBM and measured
    # ~20% slower end-to-end on the 97.6M sampler step
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    y = (xg.astype(cd) - mean.astype(cd)) * rs.astype(cd)
    y = y.reshape(b, h, w, c)
    y = y * scale.astype(cd) + bias.astype(cd)
    return _ACTS[act](y).astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, part_ref, o_ref, *,
               eps: float, act: str, hw: int, cg: int):
    x = x_ref[0].astype(jnp.float32)          # (HW, C)
    part = part_ref[...]                       # (C, G) 0/1 partition
    n = float(hw * cg)
    # group moments via MXU: colsum (1, C) @ (C, G) -> (1, G); HIGHEST
    # precision is required -- a bf16 pass loses the low mantissa bits of
    # the ~n-sized sums and the E[x^2]-E[x]^2 cancellation amplifies it
    dot = partial(jax.lax.dot_general,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    s1 = dot(jnp.sum(x, axis=0, keepdims=True), part)
    s2 = dot(jnp.sum(x * x, axis=0, keepdims=True), part)
    mean_g = s1 / n
    # clamp: E[x^2]-E[x]^2 can cancel below zero in f32 for near-constant
    # groups with large mean, and rsqrt(negative+eps) is NaN
    var_g = jnp.maximum(s2 / n - mean_g * mean_g, 0.0)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = dot(mean_g, part.T)
    rstd_c = dot(jax.lax.rsqrt(var_g + eps), part.T)
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[...] + bias_ref[...]
    o_ref[0] = _ACTS[act](y).astype(o_ref.dtype)


def _pallas_gn(x, scale, bias, num_groups: int, eps: float, act: str):
    b, h, w, c = x.shape
    hw = h * w
    part = jnp.asarray(
        np.repeat(np.eye(num_groups, dtype=np.float32),
                  c // num_groups, axis=0))  # (C, G)
    x2 = x.reshape(b, hw, c)
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((c, num_groups), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_gn_kernel, eps=eps, act=act, hw=hw, cg=c // num_groups),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[spec, vspec, vspec, pspec],
        out_specs=spec,
    )(x2, scale.reshape(1, c), bias.reshape(1, c), part)
    return out.reshape(b, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_vjp(x, scale, bias, num_groups, eps, act):
    return _pallas_gn(x, scale, bias, num_groups, eps, act)


def _gn_fwd(x, scale, bias, num_groups, eps, act):
    return _pallas_gn(x, scale, bias, num_groups, eps, act), (x, scale, bias)


def _gn_bwd(num_groups, eps, act, res, g):
    x, scale, bias = res
    _, pullback = jax.vjp(
        lambda x_, s_, b_: group_norm_act_reference(
            x_, s_, b_, num_groups, eps, act), x, scale, bias)
    return pullback(g)


_gn_vjp.defvjp(_gn_fwd, _gn_bwd)


def _pallas_ok(h: int, w: int, c: int, num_groups: int) -> bool:
    # one batch slice (x + y in VMEM) plus lane-friendly channels; group
    # count must divide the channels evenly
    return (
        c % 128 == 0
        and c % num_groups == 0
        and (h * w) % 8 == 0
        and 2 * h * w * c * 4 < 10 * 1024 * 1024
    )


# NOT jitted: callers (model applies) are jitted already, and keeping the
# dispatch outside a jit boundary means the fused_gn opt-in is read at
# every trace instead of being frozen into a cached compilation.
def fused_group_norm_act(x, scale, bias, num_groups: int, eps: float = 1e-6,
                         act: str = "none", force: bool | None = None):
    """NHWC (B, H, W, C) -> same. ``force=True/False`` overrides dispatch.

    Default dispatch is the jnp chain: measured end-to-end on a v5e, the
    handwritten kernel LOSES to XLA here (55 vs 34 ms per 97.6M-param
    sampler step) because the pallas_call materializes its operands in HBM
    and blocks XLA from fusing the normalize+act into neighboring ops,
    while the GN itself is bandwidth-bound. The kernel is kept (correct,
    grad-tested) for shapes/pipelines where a single VMEM pass wins; opt in
    with ``model.score_fn.fused_gn=true`` (env override PSLD_FUSED_GN=1)
    or force=True.
    """
    from psld_tpu import knobs

    assert act in _ACTS, act
    b, h, w, c = x.shape
    use = force if force is not None else (
        knobs.fused_gn()
        and jax.default_backend() == "tpu"
        and _pallas_ok(h, w, c, num_groups)
    )
    if not use:
        return group_norm_act_reference(x, scale, bias, num_groups, eps, act)
    return _gn_vjp(x, scale, bias, num_groups, eps, act)
