"""Reference Lightning-checkpoint conversion (psld_tpu/train/torch_import.py).

Gold test: import the ACTUAL reference NCSN++ (read-only mount at
/root/reference, CPU, with the CUDA-op package stubbed by the numpy
upfirdn oracle and the registry stubbed), randomize it, convert its
state_dict, and require the flax forward to match the torch forward.
This validates the whole-module naming walk AND the per-layer transforms
end-to-end, across the config matrix (ddpm/biggan, fir/naive, fourier/
positional, every progressive mode).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracles import upfirdn2d_oracle  # noqa: E402

from psld_tpu.config import ConfigDict  # noqa: E402
from psld_tpu.train import torch_import as ti  # noqa: E402

REF_DIR = "/root/reference/main/models/score_fn/song_sde"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_DIR),
    reason="reference checkout not mounted at /root/reference")


@pytest.fixture(scope="module")
def ref_song():
    """The reference song_sde package imported WITHOUT its CUDA ops:
    a synthetic package rooted at the song_sde directory (bypasses
    models/__init__.py's pytorch_lightning imports), with `refsong.op`
    replaced by a torch wrapper over the numpy upfirdn oracle and the
    top-level `util` registry stubbed."""
    op = types.ModuleType("refsong.op")

    def upfirdn2d(x, k, up=1, down=1, pad=(0, 0)):
        xn = x.detach().cpu().numpy().transpose(0, 2, 3, 1)
        out = upfirdn2d_oracle(xn, k.detach().cpu().numpy(), up=up,
                               down=down, pad=tuple(pad))
        return torch.from_numpy(
            np.ascontiguousarray(out.transpose(0, 3, 1, 2))).to(x.dtype)

    op.upfirdn2d = upfirdn2d

    util_stub = types.ModuleType("util")

    def register_module(category=None, name=None):
        def deco(cls):
            return cls

        return deco

    util_stub.register_module = register_module

    pkg = types.ModuleType("refsong")
    pkg.__path__ = [REF_DIR]

    saved = {k: sys.modules.get(k) for k in ("refsong", "refsong.op", "util")}
    sys.modules["refsong"] = pkg
    sys.modules["refsong.op"] = op
    sys.modules["util"] = util_stub
    try:
        ncsnpp = importlib.import_module("refsong.ncsnpp")
        ncsnpp_clf = importlib.import_module("refsong.ncsnpp_clf")

        # The reference's naive upsample calls
        # ``F.interpolate(x, (H*2, W*2), 'nearest')`` (layerspp.py:120),
        # passing the mode string positionally into scale_factor -- a
        # latent bug that raises on any torch (the published configs all
        # use fir=True so it never fires there). Shim F inside the imported
        # module to restore the intended nearest-neighbor semantics.
        real_F = importlib.import_module("torch.nn.functional")

        class _FShim:
            def __getattr__(self, name):
                return getattr(real_F, name)

            @staticmethod
            def interpolate(x, size=None, scale_factor=None, **kw):
                if isinstance(scale_factor, str):
                    return real_F.interpolate(x, size=size,
                                              mode=scale_factor)
                return real_F.interpolate(x, size=size,
                                          scale_factor=scale_factor, **kw)

        sys.modules["refsong.layerspp"].F = _FShim()
        yield types.SimpleNamespace(ncsnpp=ncsnpp, ncsnpp_clf=ncsnpp_clf)
    finally:
        for k in [m for m in sys.modules if m.startswith("refsong")]:
            sys.modules.pop(k, None)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def make_cfg(clf=False, **over):
    fn = dict(name="ncsnpp_clf" if clf else "ncsnpp", in_ch=2, out_ch=2,
              nonlinearity="swish", nf=8, ch_mult=[1, 2], num_res_blocks=2,
              attn_resolutions=[8], dropout=0.0, resamp_with_conv=True,
              noise_cond=True, fir=False, fir_kernel=[1, 3, 3, 1],
              skip_rescale=True, resblock_type="biggan", progressive="none",
              progressive_input="none", progressive_combine="sum",
              embedding_type="positional", init_scale=0.0,
              fourier_scale=16.0)
    if clf:
        fn["n_cls"] = 3
    fn.update(over)
    return ConfigDict({
        "model": {("clf_fn" if clf else "score_fn"): fn},
        "data": {"image_size": 16},
        "training": {"continuous": True},
    })


SCORE_CASES = [
    # ddpm blocks, naive resampling, positional embedding, NIN shortcuts
    dict(resblock_type="ddpm", embedding_type="positional"),
    # the SOTA CIFAR-10 shape: biggan + fir + fourier + residual input
    dict(fir=True, embedding_type="fourier", progressive_input="residual"),
    # output-skip pyramid + input-skip with cat combiner (paramless
    # pyramid up/downsample modules must bump flax counters, not consume)
    dict(fir=True, embedding_type="fourier", progressive="output_skip",
         progressive_input="input_skip", progressive_combine="cat"),
    # residual output pyramid without fir (conv-upsample path)
    dict(progressive="residual"),
]


def _convert_and_check(ref_model, kw, walk, x, t, clf_head=False):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = ti._convert(sd, walk, kw, clf_head=clf_head)
    return params, sd


@needs_reference
@pytest.mark.parametrize("over", SCORE_CASES)
def test_score_forward_equivalence(ref_song, over):
    from psld_tpu.models.ncsnpp import NCSNpp, _model_kwargs

    cfg = make_cfg(**over)
    torch.manual_seed(0)
    ref = ref_song.ncsnpp.NCSNpp(cfg).eval()

    kw = _model_kwargs(cfg)
    params, _ = _convert_and_check(ref, kw, ti.score_module_walk(kw),
                                   None, None)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)

    net = NCSNpp(**kw)
    abstract = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                              jnp.asarray(x), jnp.asarray(t))
    ti.verify_tree(params, abstract)

    out = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)


@needs_reference
def test_clf_forward_equivalence(ref_song):
    from psld_tpu.models.ncsnpp import NCSNppClassifier, _model_kwargs_clf

    cfg = make_cfg(clf=True, fir=True, embedding_type="fourier")
    torch.manual_seed(0)
    ref = ref_song.ncsnpp_clf.NCSNppClassifier(cfg).eval()

    kw = _model_kwargs_clf(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ti._convert(sd, ti.clf_module_walk(kw), kw, clf_head=True)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)

    net = NCSNppClassifier(**kw)
    abstract = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                              jnp.asarray(x), jnp.asarray(t))
    ti.verify_tree(params, abstract)

    out = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)


@needs_reference
def test_lightning_checkpoint_roundtrip(ref_song, tmp_path):
    """A wrapper-shaped Lightning checkpoint (score_fn. + ema_score_fn.
    prefixes, wrapper.py:31) converts via the public API, and the EMA tree
    is taken from the EMA weights."""
    from psld_tpu.models.ncsnpp import NCSNpp, _model_kwargs

    cfg = make_cfg(fir=True, embedding_type="fourier",
                   progressive_input="residual")
    torch.manual_seed(1)
    ref = ref_song.ncsnpp.NCSNpp(cfg).eval()
    sd = ref.state_dict()
    state_dict = {}
    for k, v in sd.items():
        state_dict[f"score_fn.{k}"] = v
        state_dict[f"ema_score_fn.{k}"] = v * 2.0  # distinguishable EMA
    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": state_dict, "epoch": 7}, path)

    params, ema_params = ti.convert_score_checkpoint(path, cfg)
    kw = _model_kwargs(cfg)
    net = NCSNpp(**kw)
    abstract = jax.eval_shape(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 2), jnp.float32),
        jnp.full((1,), 0.5, jnp.float32))
    ti.verify_tree(params, abstract)
    ti.verify_tree(ema_params, abstract)

    p = jax.tree_util.tree_leaves(params)
    e = jax.tree_util.tree_leaves(ema_params)
    np.testing.assert_allclose(np.asarray(e[0]), 2.0 * np.asarray(p[0]),
                               rtol=1e-6)


def test_module_count_mismatch_is_loud():
    kw = dict(image_size=16, in_ch=2, out_ch=2, nonlinearity="swish", nf=8,
              ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
              dropout=0.0, resamp_with_conv=True, noise_cond=True,
              fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True,
              resblock_type="biggan", progressive="none",
              progressive_input="none", progressive_combine="sum",
              embedding_type="positional", init_scale=0.0,
              fourier_scale=16.0)
    names = ti.score_module_walk(kw)
    sd = {"all_modules.0.weight": np.zeros((8, 2, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="module-count mismatch"):
        ti._convert(sd, names, kw)


def test_cli_arg_split_handles_lightning_default_names(tmp_path):
    """Lightning's DEFAULT checkpoint filename (`epoch=0-step=999.ckpt`)
    and our `...-epoch=0042` dirs must parse as positionals, overrides as
    overrides."""
    from psld_tpu.cli.convert_checkpoint import _split_args

    pos, ovr = _split_args(["epoch=0-step=999.ckpt", "outdir",
                            "+dataset=cifar10/cifar10_psld", "a.b_c=1"])
    assert pos == ["epoch=0-step=999.ckpt", "outdir"]
    assert ovr == ["+dataset=cifar10/cifar10_psld", "a.b_c=1"]

    d = tmp_path / "psld-score_xm-epoch=0042"
    d.mkdir()
    pos, ovr = _split_args([str(d), "out.ckpt", "x.y=2"])
    assert pos == [str(d), "out.ckpt"] and ovr == ["x.y=2"]
