"""FIR up/down-sampling as native XLA convolutions.

TPU-native replacement for the reference's StyleGAN2 CUDA kernel pair
(song_sde/op/upfirdn2d_kernel.cu + op/upfirdn2d.py autograd wrapper): a
single ``lax.conv_general_dilated`` with ``lhs_dilation`` (zero-stuffing),
explicit padding, and ``window_strides`` expresses upsample-FIR-downsample
exactly, XLA fuses it, and gradients (of arbitrary order) come from JAX
autodiff -- no hand-written double-backward (op/upfirdn2d.py:19-142) needed.

Semantics match the reference's ``upfirdn2d_native`` (op/upfirdn2d.py:159-200)
bit-for-bit in float32: zero-stuff by ``up`` (original sample at index 0),
pad (possibly negative = crop), *true* convolution with the 2D kernel,
stride by ``down``. Layout is NHWC; kernels are applied depthwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def setup_kernel(k) -> np.ndarray:
    """Normalize a 1D (separable) or 2D FIR kernel
    (reference up_or_down_sampling.py:181-188)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= k.sum()
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """Upsample-FIR-downsample, NHWC, same-kernel-per-channel (depthwise).

    The reference zero-stuffs to length ``H*up`` (trailing zeros kept,
    op/upfirdn2d.py:166-170) while ``lhs_dilation`` produces ``(H-1)*up+1``;
    the difference is absorbed into trailing padding.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # true convolution == cross-correlation with the flipped kernel
    rhs = jnp.flip(kernel, (0, 1)).astype(x.dtype).reshape(kh, kw, 1, 1)
    rhs = jnp.broadcast_to(rhs, (kh, kw, 1, c))
    tail = up - 1  # trailing stuffed zeros the reference keeps
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        padding=((pad[0], pad[1] + tail), (pad[0], pad[1] + tail)),
        lhs_dilation=(up, up),
        dimension_numbers=_DIMNUMS,
        feature_group_count=c,
    )


def naive_upsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour upsample (reference up_or_down_sampling.py:59-63)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Mean-pool downsample (reference up_or_down_sampling.py:66-69)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def upsample_2d(x: jax.Array, k=None, factor: int = 2, gain: float = 1.0):
    """FIR upsample (reference up_or_down_sampling.py:195-224)."""
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jax.Array, k=None, factor: int = 2, gain: float = 1.0):
    """FIR downsample (reference up_or_down_sampling.py:227-257)."""
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor,
                     pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: jax.Array, w: jax.Array, k=None, factor: int = 2,
                     gain: float = 1.0) -> jax.Array:
    """Fused stride-``factor`` transposed conv followed by FIR
    (reference up_or_down_sampling.py:72-141).

    The reference's conv_transpose2d with pre-flipped/permuted weights
    reduces to a plain cross-correlation of the zero-stuffed input with the
    *original* weight; that is one ``conv_general_dilated`` here. ``w`` is
    HWIO ``(kh, kw, in, out)``.
    """
    assert w.ndim == 4 and w.shape[0] == w.shape[1]
    kh = w.shape[0]
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = (k.shape[0] - factor) - (kh - 1)

    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=_DIMNUMS,
    )
    return upfirdn2d(y, jnp.asarray(k),
                     pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: jax.Array, w: jax.Array, k=None, factor: int = 2,
                       gain: float = 1.0) -> jax.Array:
    """Fused FIR followed by stride-``factor`` conv
    (reference up_or_down_sampling.py:144-178). ``w`` is HWIO."""
    assert w.ndim == 4 and w.shape[0] == w.shape[1]
    kh = w.shape[0]
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (kh - 1)
    y = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        y,
        w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=_DIMNUMS,
    )
