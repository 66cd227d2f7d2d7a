"""NCSN++ score U-Net and noise-conditional classifier, flax.linen, NHWC.

TPU-first re-implementation of the reference NCSN++
(song_sde/ncsnpp.py:35-438, song_sde/ncsnpp_clf.py:35-283): the same compute
graph -- Fourier/positional time embeddings, BigGAN/DDPM resblocks, FIR or
naive resampling, full-spatial attention at the configured resolutions,
progressive input/output pyramids, skip-rescale /sqrt(2) -- expressed as
structured submodules instead of a flat ModuleList walked with a cursor.
For PSLD, in_ch = out_ch = 2 * num_channels (x || m on the channel axis).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.models import layers
from psld_tpu.registry import register_module

SQRT2 = float(np.sqrt(2.0))


def _model_kwargs(config) -> dict:
    """Extract hashable constructor kwargs from a config tree
    (diffusion.model.score_fn + data.image_size). Also latches the
    op-level perf knobs (fused_gn/pad_attn) this config declares —
    config-built models always run under their config's knobs."""
    from psld_tpu import knobs

    knobs.configure(config)
    sf = config.model.score_fn
    return dict(
        image_size=int(config.data.image_size),
        in_ch=int(sf.in_ch),
        out_ch=int(sf.get("out_ch", sf.in_ch)),
        nonlinearity=str(sf.nonlinearity),
        nf=int(sf.nf),
        ch_mult=tuple(sf.ch_mult),
        num_res_blocks=int(sf.num_res_blocks),
        attn_resolutions=tuple(sf.attn_resolutions),
        dropout=float(sf.dropout),
        resamp_with_conv=bool(sf.resamp_with_conv),
        noise_cond=bool(sf.noise_cond),
        fir=bool(sf.fir),
        fir_kernel=tuple(sf.fir_kernel),
        skip_rescale=bool(sf.skip_rescale),
        resblock_type=str(sf.resblock_type).lower(),
        progressive=str(sf.progressive).lower(),
        progressive_input=str(sf.progressive_input).lower(),
        progressive_combine=str(sf.progressive_combine).lower(),
        embedding_type=str(sf.embedding_type).lower(),
        init_scale=float(sf.init_scale),
        fourier_scale=float(sf.fourier_scale),
        remat=bool(sf.get("remat", False)),
        scan_blocks=bool(sf.get("scan_blocks", False)),
        dropout_impl=str(sf.get("dropout_impl", "save_mask")),
    )


_REMAT_BLOCK_CLS: dict = {}


def _remat_block_cls(cls):
    """nn.remat-wrapped resblock class with the ORIGINAL class name --
    flax derives auto-names (``ResnetBlockBigGAN_3``) from ``__name__``,
    and the wrapper's default ``Checkpoint*`` name would shift every
    parameter path (breaking checkpoint and torch-import compatibility).
    static_argnums: (self, x, temb, train) -> ``train`` is static."""
    if cls not in _REMAT_BLOCK_CLS:
        wrapped = nn.remat(cls, static_argnums=(3,))
        wrapped.__name__ = cls.__name__
        _REMAT_BLOCK_CLS[cls] = wrapped
    return _REMAT_BLOCK_CLS[cls]


class _ScanBody(nn.Module):
    """One (ResBlock [+ Attn]) step of an nn.scan'd same-shape stack.

    Holds plain (class, kwargs) specs instead of factory closures: a
    closure over the parent module would re-enter the parent's method
    scope and flax would parent the new submodule to the U-Net itself.
    """

    block_cls: Any
    block_kwargs: Any
    attn_cls: Any
    attn_kwargs: Any
    train: bool

    @nn.compact
    def __call__(self, h, temb):
        h = self.block_cls(**self.block_kwargs)(h, temb, self.train)
        if self.attn_cls is not None:
            h = self.attn_cls(**self.attn_kwargs)(h)
        return h, h


class _ScanBodyCat(nn.Module):
    """Decoder variant: each step concatenates its stacked skip."""

    block_cls: Any
    block_kwargs: Any
    train: bool

    @nn.compact
    def __call__(self, h, skip, temb):
        h = self.block_cls(**self.block_kwargs)(
            jnp.concatenate([h, skip], axis=-1), temb, self.train)
        return h, None


class _NCSNBase(nn.Module):
    """Shared configuration fields + encoder trunk."""

    image_size: int = 32
    in_ch: int = 6
    out_ch: int = 6
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    noise_cond: bool = True
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "none"
    progressive_input: str = "none"
    progressive_combine: str = "sum"
    embedding_type: str = "positional"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    # per-RESBLOCK rematerialization: only one block's activations are live
    # during the backward pass (whole-network jax.checkpoint was measured
    # NOT to reduce peak HBM -- the full forward recomputes at once).
    # Parameter paths are unchanged (nn.remat preserves module names).
    remat: bool = False
    # fold each same-shape run of (ResBlock [+ Attn]) into one nn.scan
    # stack: the body is traced/compiled ONCE instead of num_res_blocks
    # times, shrinking the HLO ~8x for the SOTA recipe (8 blocks/level,
    # scripts_psld/sota/uncond/cifar10/train_uncond_psld.sh:14) where
    # first-compile time is super-linear in program size. CHANGES the
    # parameter layout (stacked leading axis); converters:
    # psld_tpu.models.scan_params.{to_scanned,from_scanned}.
    scan_blocks: bool = False
    # dropout implementation for every resblock (save_mask | hw |
    # hw_inline | remat; env overrides apply —
    # models/layers.py::resolve_dropout_impl). `hw_inline` is the
    # recommended TPU setting: the counter-hash mask regenerated in
    # backward, lowered as inline jnp ops XLA fuses into the neighboring
    # epilogues (+31% train step vs save_mask, PARITY round-4 §1).
    dropout_impl: str = "save_mask"

    def _validate(self):
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.embedding_type in ("fourier", "positional")
        assert self.resblock_type in ("ddpm", "biggan")

    @property
    def act(self):
        return layers.get_act(self.nonlinearity)

    @property
    def all_resolutions(self):
        return [self.image_size // (2**i) for i in range(len(self.ch_mult))]

    def _resnet_block_spec(self, **kw):
        """(class, ctor kwargs) for a resblock — constructable either here
        or inside a scan body (which must not call parent methods)."""
        ddpm = self.resblock_type == "ddpm"
        cls = layers.ResnetBlockDDPM if ddpm else layers.ResnetBlockBigGAN
        if self.remat:
            cls = _remat_block_cls(cls)
        if ddpm:
            kwargs = dict(
                act=self.act, dropout=self.dropout,
                init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                dropout_impl=self.dropout_impl,
                **{k: v for k, v in kw.items() if k not in ("up", "down")},
            )
        else:
            kwargs = dict(
                act=self.act, dropout=self.dropout, fir=self.fir,
                fir_kernel=self.fir_kernel, init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
                dropout_impl=self.dropout_impl, **kw,
            )
        return cls, kwargs

    def _resnet_block(self, counters=None, **kw):
        """``counters`` (scan mode only) pins the explicit name to the index
        flax auto-naming WOULD assign in the unscanned model, so every
        non-folded parameter path is identical across the two layouts."""
        cls, kwargs = self._resnet_block_spec(**kw)
        if self.scan_blocks and counters is not None:
            kwargs["name"] = f"{cls.__name__}_{counters['rb']}"
            counters["rb"] += 1
        return cls(**kwargs)

    def _attn(self, counters=None):
        kw = {}
        if self.scan_blocks and counters is not None:
            kw["name"] = f"AttnBlock_{counters['at']}"
            counters["at"] += 1
        return layers.AttnBlock(skip_rescale=self.skip_rescale,
                                init_scale=self.init_scale, **kw)

    def _scan_run(self, n, with_attn, counters, train, out_ch,
                  decoder=False):
        """Build one nn.scan stack over ``n`` identical (ResBlock [+Attn])
        bodies. The stack's name records the unscanned auto-name indexes it
        folds (``scan_rb<first>_at<first|-1>_n<len>``), which is all the
        layout converters need (models/scan_params.py)."""
        name = (f"scan_rb{counters['rb']}_"
                f"at{counters['at'] if with_attn else -1}_n{n}")
        counters["rb"] += n
        if with_attn:
            counters["at"] += n
        body = _ScanBodyCat if decoder else _ScanBody
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast) if decoder else nn.broadcast,
            length=n,
        )
        block_cls, block_kwargs = self._resnet_block_spec(out_ch=out_ch)
        kw = dict(block_cls=block_cls, block_kwargs=block_kwargs,
                  train=train, name=name)
        if not decoder:
            kw["attn_cls"] = layers.AttnBlock if with_attn else None
            kw["attn_kwargs"] = dict(skip_rescale=self.skip_rescale,
                                     init_scale=self.init_scale)
        return scanned(**kw)

    def _time_embedding(self, time_cond):
        """(reference ncsnpp.py:287-313)"""
        if self.embedding_type == "fourier":
            temb = layers.GaussianFourierProjection(
                embedding_size=self.nf, scale=self.fourier_scale
            )(jnp.log(time_cond))
        else:
            temb = layers.get_timestep_embedding(time_cond, self.nf)
        if self.noise_cond:
            dense = partial(nn.Dense, kernel_init=layers.default_init(),
                            bias_init=nn.initializers.zeros)
            temb = dense(self.nf * 4)(temb)
            temb = dense(self.nf * 4)(self.act(temb))
        else:
            temb = None
        return temb

    def _cast_temb(self, temb, x):
        """Keep the embedding math f32 but hand the trunk a temb in the
        activation dtype, so mixed-precision (training.bf16) stays bf16
        through the resblock time-bias Denses instead of promoting."""
        if temb is not None and temb.dtype != x.dtype:
            temb = temb.astype(x.dtype)
        return temb

    def _encoder(self, x, temb, train: bool, counters=None):
        """Down path + middle (reference ncsnpp.py:319-367); returns the
        middle output and the skip stack. ``counters`` threads the
        scan-mode naming state (see ``_resnet_block``)."""
        counters = counters if counters is not None else {"rb": 0, "at": 0}
        num_resolutions = len(self.ch_mult)
        all_res = self.all_resolutions

        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = x

        hs = [layers.conv3x3(self.nf)(x)]
        for i_level in range(num_resolutions):
            out_ch = self.nf * self.ch_mult[i_level]
            with_attn = all_res[i_level] in self.attn_resolutions
            j = 0
            while j < self.num_res_blocks:
                # maximal same-shape run: every block after the first has
                # in_ch == out_ch, so once the channels line up the whole
                # remainder of the level folds into one scan stack
                run = (self.num_res_blocks - j
                       if self.scan_blocks and hs[-1].shape[-1] == out_ch
                       else 1)
                if run >= 2:
                    h, ys = self._scan_run(run, with_attn, counters, train,
                                           out_ch)(hs[-1], temb)
                    hs.extend(ys[s] for s in range(run))
                    j += run
                else:
                    h = self._resnet_block(counters, out_ch=out_ch)(
                        hs[-1], temb, train)
                    if with_attn:
                        h = self._attn(counters)(h)
                    hs.append(h)
                    j += 1

            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = layers.Downsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=self.fir_kernel)(hs[-1])
                else:
                    h = self._resnet_block(counters, down=True)(
                        hs[-1], temb, train)

                if self.progressive_input == "input_skip":
                    input_pyramid = layers.Downsample(
                        fir=self.fir, fir_kernel=self.fir_kernel,
                        with_conv=False)(input_pyramid)
                    h = layers.Combine(
                        dim2=h.shape[-1],
                        method=self.progressive_combine)(input_pyramid, h)
                elif self.progressive_input == "residual":
                    input_pyramid = layers.Downsample(
                        out_ch=h.shape[-1], fir=self.fir,
                        fir_kernel=self.fir_kernel,
                        with_conv=True)(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / SQRT2
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        h = hs[-1]
        h = self._resnet_block(counters)(h, temb, train)
        h = self._attn(counters)(h)
        h = self._resnet_block(counters)(h, temb, train)
        return h, hs


@register_module(category="score_fn", name="ncsnpp")
class NCSNpp(_NCSNBase):
    """NCSN++ (reference song_sde/ncsnpp.py:35-438)."""

    @classmethod
    def from_config(cls, config) -> "NCSNpp":
        return cls(**_model_kwargs(config))

    @nn.compact
    def __call__(self, x: jax.Array, time_cond: jax.Array,
                 train: bool = False) -> jax.Array:
        self._validate()
        num_resolutions = len(self.ch_mult)
        all_res = self.all_resolutions

        counters = {"rb": 0, "at": 0}
        temb = self._cast_temb(self._time_embedding(time_cond), x)
        h, hs = self._encoder(x, temb, train, counters)

        # Upsampling path (reference ncsnpp.py:369-421)
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            out_ch = self.nf * self.ch_mult[i_level]
            total = self.num_res_blocks + 1
            j = 0
            while j < total:
                # maximal run with the carry already at out_ch and a
                # constant skip width (runs break at level boundaries
                # where the popped skip changes channel count)
                run = 1
                if self.scan_blocks and h.shape[-1] == out_ch:
                    skip_c = hs[-1].shape[-1]
                    while (j + run < total
                           and hs[-1 - run].shape[-1] == skip_c):
                        run += 1
                if run >= 2:
                    skips = jnp.stack([hs.pop() for _ in range(run)])
                    h, _ = self._scan_run(run, False, counters, train,
                                          out_ch, decoder=True)(
                        h, skips, temb)
                    j += run
                else:
                    h = self._resnet_block(counters, out_ch=out_ch)(
                        jnp.concatenate([h, hs.pop()], axis=-1), temb,
                        train)
                    j += 1

            if all_res[i_level] in self.attn_resolutions:
                h = self._attn(counters)(h)

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = layers.conv3x3(
                            self.out_ch, init_scale=self.init_scale)(
                            layers.norm_act(h, self.act))
                    else:  # residual
                        pyramid = layers.conv3x3(h.shape[-1])(
                            layers.norm_act(h, self.act))
                else:
                    if self.progressive == "output_skip":
                        pyramid = layers.Upsample(
                            fir=self.fir, fir_kernel=self.fir_kernel,
                            with_conv=False)(pyramid)
                        pyramid_h = layers.conv3x3(
                            self.out_ch, init_scale=self.init_scale)(
                            layers.norm_act(h, self.act))
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = layers.Upsample(
                            out_ch=h.shape[-1], fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            with_conv=True)(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / SQRT2
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = layers.Upsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=self.fir_kernel)(h)
                else:
                    h = self._resnet_block(counters, up=True)(h, temb, train)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = layers.norm_act(h, self.act)
            h = layers.conv3x3(self.out_ch, init_scale=self.init_scale)(h)
        return h


@register_module(category="clf_fn", name="ncsnpp_clf")
class NCSNppClassifier(_NCSNBase):
    """Noise-conditional classifier: NCSN++ encoder trunk + bias-free linear
    head (reference song_sde/ncsnpp_clf.py:35-283)."""

    n_cls: int = 10

    @classmethod
    def from_config(cls, config) -> "NCSNppClassifier":
        kwargs = _model_kwargs_clf(config)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, x: jax.Array, time_cond: jax.Array,
                 train: bool = False) -> jax.Array:
        self._validate()
        temb = self._cast_temb(self._time_embedding(time_cond), x)
        h, _ = self._encoder(x, temb, train)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.n_cls, use_bias=False,
                        kernel_init=layers.default_init())(h)


def _model_kwargs_clf(config) -> dict:
    from psld_tpu import knobs

    knobs.configure(config)
    cf = config.model.clf_fn
    kwargs = dict(
        image_size=int(config.data.image_size),
        in_ch=int(cf.in_ch),
        out_ch=int(cf.in_ch),
        nonlinearity=str(cf.nonlinearity),
        nf=int(cf.nf),
        ch_mult=tuple(cf.ch_mult),
        num_res_blocks=int(cf.num_res_blocks),
        attn_resolutions=tuple(cf.attn_resolutions),
        dropout=float(cf.dropout),
        resamp_with_conv=bool(cf.resamp_with_conv),
        noise_cond=bool(cf.noise_cond),
        fir=bool(cf.fir),
        fir_kernel=tuple(cf.fir_kernel),
        skip_rescale=bool(cf.skip_rescale),
        resblock_type=str(cf.resblock_type).lower(),
        progressive=str(cf.progressive).lower(),
        progressive_input=str(cf.progressive_input).lower(),
        progressive_combine=str(cf.progressive_combine).lower(),
        embedding_type=str(cf.embedding_type).lower(),
        init_scale=float(cf.init_scale),
        fourier_scale=float(cf.fourier_scale),
        remat=bool(cf.get("remat", False)),
        scan_blocks=bool(cf.get("scan_blocks", False)),
        dropout_impl=str(cf.get("dropout_impl", "save_mask")),
        n_cls=int(cf.n_cls),
    )
    return kwargs
