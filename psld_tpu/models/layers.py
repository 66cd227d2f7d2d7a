"""NCSN++ layer library in flax.linen, NHWC.

TPU-first re-implementation of the reference layer zoo
(song_sde/layers.py, song_sde/layerspp.py): same compute graph and
initialization (variance_scaling fan_avg uniform -- the JAX initializer the
torch code was itself ported from, layers.py:39-76), idiomatic module
structure instead of the flat ModuleList + cursor walk.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)

SQRT2 = float(np.sqrt(2.0))


class RematDropout(nn.Module):
    """``nn.Dropout`` with the mask REGENERATED in the backward pass.

    Bit-identical to ``nn.Dropout`` (same ``make_rng('dropout')`` stream —
    instances are named ``Dropout_N`` so the rng derivation path matches —
    same bernoulli draw, same ``lax.select``); only the autodiff residuals
    change: ``jax.checkpoint`` saves (key, input) and recomputes the mask
    for the VJP instead of storing an activation-sized mask + masked
    activation at every dropout site. Motivation: dropout measured as 28%
    of the flagship's bf16 train step while the hardware-RNG swap was
    neutral (PARITY round-3 §2), so the saved residuals were the suspect.
    MEASURED AND REFUTED on-chip: regeneration is 2% *slower* (433.2 vs
    442.2 img/s, donated buffers) and OOMs HBM without donation — the
    dropout cost is the select's fused fwd+bwd traffic itself, which
    recomputation duplicates rather than removes. Ships opt-in
    (``PSLD_DROPOUT_REMAT=1``) as the documented negative result; stock
    ``nn.Dropout`` stays the default.
    """

    rate: float
    deterministic: bool

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")

        @jax.checkpoint
        def apply(rng, h):
            mask = jax.random.bernoulli(rng, p=keep, shape=h.shape)
            return jax.lax.select(mask, h / keep, jnp.zeros_like(h))

        return apply(rng, x)


class HWDropout(nn.Module):
    """Dropout via the Pallas counter-hash kernel (``ops.dropout``).

    Statistically equivalent to ``nn.Dropout`` (inverted 1/keep scaling,
    same ``make_rng('dropout')`` stream feeding the seed) but the mask is
    a counter hash of (key, global position) REGENERATED in the backward
    pass instead of saved — no activation-sized residual reaches HBM. Not
    bit-identical to the threefry masks, so it is a distinct impl
    (``dropout_impl=hw``); see ``ops/dropout.py`` for the traffic
    accounting and PARITY round-3/4 for the measurements.
    """

    rate: float
    deterministic: bool
    # None = auto (Pallas kernel on TPU); False = force the inline jnp
    # lowering of the SAME hash (``dropout_impl=hw_inline``): XLA fuses
    # the hash+select into the neighboring ops' epilogues like stock
    # dropout's threefry, but the custom VJP still regenerates (never
    # saves) the mask — no pallas_call boundary passes at all.
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x):
        from psld_tpu.ops import hw_dropout

        if self.deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        rng = self.make_rng("dropout")
        seed = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
        return hw_dropout(x, seed, float(self.rate), self.use_pallas)


DROPOUT_IMPLS = ("save_mask", "hw", "hw_inline", "remat")


def resolve_dropout_impl(impl: str = "save_mask") -> str:
    """The effective dropout implementation: the env vars
    ``PSLD_DROPOUT_PALLAS`` / ``PSLD_DROPOUT_REMAT`` (1 forces the impl
    on, 0 forces ``save_mask``) override the config value ``impl``
    (``model.score_fn.dropout_impl``)."""
    pallas = os.environ.get("PSLD_DROPOUT_PALLAS")
    remat = os.environ.get("PSLD_DROPOUT_REMAT")
    if pallas == "1":
        return "hw"
    if remat == "1":
        return "remat"
    if (pallas == "0" and impl in ("hw", "hw_inline")) or (
            remat == "0" and impl == "remat"):
        return "save_mask"
    if impl not in DROPOUT_IMPLS:
        raise ValueError(
            f"dropout_impl must be one of {DROPOUT_IMPLS}; got {impl!r}")
    return impl


def dropout_layer(h, rate: float, train: bool, impl: str = "save_mask"):
    """Dropout dispatch for the resblocks (``model.score_fn.dropout_impl``,
    env overrides via :func:`resolve_dropout_impl`):

    - ``save_mask`` (default): stock ``nn.Dropout`` — threefry mask saved
      for the backward (reference parity semantics).
    - ``hw``: the Pallas counter-hash kernel regenerating the mask in the
      backward (:class:`HWDropout`) — measured +13.5% on the flagship
      bf16 train step (PARITY round-4).
    - ``hw_inline``: the SAME counter-hash mask, lowered inline as jnp
      ops instead of a Pallas kernel — XLA fuses the hash+select into
      the neighboring epilogues (no kernel-boundary passes), and the
      custom VJP still regenerates the mask in the backward. Bit-
      identical outputs to ``hw``; measured **+31%** on the flagship
      bf16 train step (581.3 img/s, 64.4% MFU — within 6% of the
      dropout-0 ceiling). The recommended TPU setting.
    - ``remat``: recompute-the-mask via ``jax.checkpoint``
      (:class:`RematDropout`) — the documented NEGATIVE result (2%
      slower), kept as the measurement's artifact.

    All branches produce the module path ``Dropout_0``, so rng streams,
    parameters (none), and checkpoints are interchangeable."""
    impl = resolve_dropout_impl(impl)
    if impl in ("hw", "hw_inline"):
        return HWDropout(rate, deterministic=not train,
                         use_pallas=None if impl == "hw" else False,
                         name="Dropout_0")(h)
    if impl == "remat":
        return RematDropout(rate, deterministic=not train,
                            name="Dropout_0")(h)
    return nn.Dropout(rate, deterministic=not train, name="Dropout_0")(h)


def get_act(name: str) -> Callable:
    """Activation dispatch (reference layers.py:14-26)."""
    name = name.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return partial(jax.nn.leaky_relu, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError(f"activation function {name} does not exist!")


def default_init(scale: float = 1.0):
    """DDPM initialization (reference layers.py:73-76)."""
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def conv3x3(out_ch: int, *, stride: int = 1, bias: bool = True,
            init_scale: float = 1.0,
            padding: Any = ((1, 1), (1, 1))) -> nn.Conv:
    """3x3 conv with DDPM init (reference layers.py:103-109)."""
    return nn.Conv(out_ch, (3, 3), strides=(stride, stride), padding=padding,
                   use_bias=bias, kernel_init=default_init(init_scale),
                   bias_init=nn.initializers.zeros)


def conv1x1(out_ch: int, *, bias: bool = True, init_scale: float = 1.0) -> nn.Conv:
    """1x1 conv with DDPM init (reference layers.py:85-90)."""
    return nn.Conv(out_ch, (1, 1), use_bias=bias,
                   kernel_init=default_init(init_scale),
                   bias_init=nn.initializers.zeros)


def group_norm(ch: int) -> "GroupNormAct":
    """GroupNorm(min(ch//4, 32)) as used inline throughout NCSN++
    (reference layerspp.py:67-68); alias of GroupNormAct(act="none") so
    every call site shares one implementation and parameter layout."""
    del ch  # channel count is inferred from the input
    return GroupNormAct(act="none")


def act_name_of(fn: Callable) -> str | None:
    """Map an activation callable back to its registry name (None if not a
    stock activation) so GN->act call sites can use the fused kernel."""
    if fn is jax.nn.silu:
        return "swish"
    if fn is jax.nn.elu:
        return "elu"
    if fn is jax.nn.relu:
        return "relu"
    if (isinstance(fn, partial) and fn.func is jax.nn.leaky_relu
            and fn.keywords.get("negative_slope") == 0.2 and not fn.args):
        return "lrelu"
    return None


class GroupNormAct(nn.Module):
    """GroupNorm(min(C//4, 32)) fused with the following activation
    (reference pattern ``act(GroupNorm(x))``, layerspp.py:183-186). Same
    parameter shapes/names ("scale", "bias") and numerics as nn.GroupNorm;
    the module path differs (GroupNormAct_N), so checkpoints are not
    interchangeable with nn.GroupNorm-based trees."""

    act: str = "none"
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from psld_tpu.ops.group_norm import fused_group_norm_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return fused_group_norm_act(x, scale, bias, min(c // 4, 32),
                                    self.eps, self.act)


def norm_act(x: jax.Array, act: Callable) -> jax.Array:
    """``act(GroupNorm(x))`` via the fused kernel when ``act`` is a stock
    activation; must be called inside an ``nn.compact`` scope."""
    name = act_name_of(act)
    if name is None:
        return act(GroupNormAct(act="none")(x))
    return GroupNormAct(act=name)(x)


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int,
                           max_positions: int = 10_000) -> jax.Array:
    """DDPM sinusoidal embedding (reference layers.py:500-514)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Random Fourier features for noise levels (reference layerspp.py:32-41).

    W is fixed at init (requires_grad=False in the reference); here it lives
    in params with a stop_gradient so optimizer/EMA handling stays uniform.
    """

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32)
            * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1x1 'network-in-network' projection over channels
    (reference layers.py:531-540); in NHWC this is a Dense on the last axis.
    """

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            self.num_units,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(x)


class Combine(nn.Module):
    """Combine a progressive-input pyramid branch with the trunk
    (reference layerspp.py:44-59)."""

    dim2: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        h = conv1x1(self.dim2)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlock(nn.Module):
    """Full-spatial single-head self-attention (reference layerspp.py:62-91).

    At NCSN++'s attn resolutions (<= 16x16 = 256 tokens) the whole score
    matrix fits on-chip; XLA maps the two einsums onto the MXU directly.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h_dim, w_dim, c = x.shape
        h = GroupNormAct(act="none")(x)
        q = NIN(c)(h)
        k = NIN(c)(h)
        v = NIN(c)(h)

        q = q.reshape(b, h_dim * w_dim, c)
        k = k.reshape(b, h_dim * w_dim, c)
        v = v.reshape(b, h_dim * w_dim, c)
        from psld_tpu.ops.attention import fused_attention

        # PSLD_NO_FUSED_ATTN=1 pins the einsum path (A/B harness for the
        # Pallas kernel; measured neutral at C=128, see PARITY)
        force = False if os.environ.get("PSLD_NO_FUSED_ATTN") else None
        h = fused_attention(q, k, v, float(int(c) ** -0.5), force=force)
        h = h.reshape(b, h_dim, w_dim, c).astype(x.dtype)
        h = NIN(c, init_scale=self.init_scale)(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / SQRT2


class FIRConv2d(nn.Module):
    """Conv2d fused with FIR resampling (StyleGAN2;
    reference up_or_down_sampling.py:23-56)."""

    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", default_init(),
            (self.kernel, self.kernel, in_ch, self.out_ch), jnp.float32,
        )
        k = list(self.resample_kernel)
        if self.up:
            x = upsample_conv_2d(x, w, k=k)
        elif self.down:
            x = conv_downsample_2d(x, w, k=k)
        else:
            pad = self.kernel // 2
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1),
                ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                           jnp.float32)
            x = x + b.astype(x.dtype)
        return x


class Upsample(nn.Module):
    """(reference layerspp.py:94-126)"""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        if not self.fir:
            y = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            if self.with_conv:
                y = conv3x3(out_ch)(y)
        else:
            if not self.with_conv:
                y = upsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                y = FIRConv2d(out_ch, kernel=3, up=True,
                              resample_kernel=self.fir_kernel)(x)
        return y


class Downsample(nn.Module):
    """(reference layerspp.py:129-163)"""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        out_ch = self.out_ch or c
        if not self.fir:
            if self.with_conv:
                # asymmetric (0,1) pad + VALID stride-2 (layerspp.py:152-154)
                y = conv3x3(out_ch, stride=2, padding=((0, 1), (0, 1)))(x)
            else:
                y = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                y = downsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                y = FIRConv2d(out_ch, kernel=3, down=True,
                              resample_kernel=self.fir_kernel)(x)
        return y


class ResnetBlockDDPM(nn.Module):
    """DDPM-style residual block (reference layerspp.py:166-209)."""

    act: Callable
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dropout_impl: str = "save_mask"

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = norm_act(x, self.act)
        h = conv3x3(out_ch)(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros)(
                self.act(temb))[:, None, None, :]
        h = norm_act(h, self.act)
        h = dropout_layer(h, self.dropout, train, self.dropout_impl)
        h = conv3x3(out_ch, init_scale=self.init_scale)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch)(x)
            else:
                x = NIN(out_ch)(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / SQRT2


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style residual block with in-block resampling
    (reference layerspp.py:212-274)."""

    act: Callable
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dropout_impl: str = "save_mask"

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = norm_act(x, self.act)

        if self.up:
            if self.fir:
                h = upsample_2d(h, list(self.fir_kernel), factor=2)
                x = upsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = naive_upsample_2d(h, factor=2)
                x = naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, list(self.fir_kernel), factor=2)
                x = downsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = naive_downsample_2d(h, factor=2)
                x = naive_downsample_2d(x, factor=2)

        h = conv3x3(out_ch)(h)
        if temb is not None:
            h += nn.Dense(out_ch, kernel_init=default_init(),
                          bias_init=nn.initializers.zeros)(
                self.act(temb))[:, None, None, :]
        h = norm_act(h, self.act)
        h = dropout_layer(h, self.dropout, train, self.dropout_impl)
        h = conv3x3(out_ch, init_scale=self.init_scale)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch)(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / SQRT2
