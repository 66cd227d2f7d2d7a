"""Reference-format checkpoint export (psld_tpu/train/torch_export.py).

Gold tests: reference model -> import -> export must reproduce the torch
state_dict bitwise (key set AND values), and the exported dict must load
into a fresh reference model with strict=True. This pins the export as the
exact inverse of the import across the config matrix.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_import import (  # noqa: E402
    SCORE_CASES, make_cfg, needs_reference, ref_song)  # noqa: F401

from psld_tpu.train import torch_export as te  # noqa: E402
from psld_tpu.train import torch_import as ti  # noqa: E402


def _assert_state_dicts_equal(got: dict, want: dict):
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), want[k].detach().numpy(), err_msg=k)


@needs_reference
@pytest.mark.parametrize("over", SCORE_CASES)
def test_score_roundtrip_bitwise(ref_song, over):  # noqa: F811
    from psld_tpu.models.ncsnpp import _model_kwargs

    cfg = make_cfg(**over)
    torch.manual_seed(0)
    ref = ref_song.ncsnpp.NCSNpp(cfg).eval()
    want = ref.state_dict()

    kw = _model_kwargs(cfg)
    names = ti.score_module_walk(kw)
    params = ti._convert({k: v.detach().numpy() for k, v in want.items()},
                         names, kw)
    got = te._export(params, names, kw)
    _assert_state_dicts_equal(got, want)

    # strict load into a fresh reference model: exact key/shape coverage
    torch.manual_seed(1)
    fresh = ref_song.ncsnpp.NCSNpp(cfg)
    fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in got.items()}, strict=True)


@needs_reference
def test_clf_roundtrip_bitwise(ref_song):  # noqa: F811
    from psld_tpu.models.ncsnpp import _model_kwargs_clf

    cfg = make_cfg(clf=True, fir=True, embedding_type="fourier")
    torch.manual_seed(0)
    ref = ref_song.ncsnpp_clf.NCSNppClassifier(cfg).eval()
    want = ref.state_dict()

    kw = _model_kwargs_clf(cfg)
    names = ti.clf_module_walk(kw)
    params = ti._convert({k: v.detach().numpy() for k, v in want.items()},
                         names, kw, clf_head=True)
    got = te._export(params, names, kw, clf_head=True)
    _assert_state_dicts_equal(got, want)


@needs_reference
def test_lightning_export_file_roundtrip(ref_song, tmp_path):  # noqa: F811
    """export_score_state_dict + save_lightning_checkpoint produce a file
    convert_score_checkpoint re-imports to the identical trees."""
    import jax

    cfg = make_cfg(fir=True, embedding_type="fourier",
                   progressive_input="residual")
    torch.manual_seed(2)
    ref = ref_song.ncsnpp.NCSNpp(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from psld_tpu.models.ncsnpp import _model_kwargs

    kw = _model_kwargs(cfg)
    names = ti.score_module_walk(kw)
    params = ti._convert(sd, names, kw)
    ema = jax.tree.map(lambda a: a * 0.5, params)

    out = te.export_score_state_dict(params, ema, cfg)
    path = str(tmp_path / "exported.ckpt")
    te.save_lightning_checkpoint(path, out, step=123)

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert ckpt["global_step"] == 123
    params2, ema2 = ti.convert_score_checkpoint(path, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(ema2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noise_cond_false_export_is_loud():
    kw = dict(image_size=16, in_ch=2, out_ch=2, nonlinearity="swish", nf=8,
              ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
              dropout=0.0, resamp_with_conv=True, noise_cond=False,
              fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True,
              resblock_type="biggan", progressive="none",
              progressive_input="none", progressive_combine="sum",
              embedding_type="positional", init_scale=0.0,
              fourier_scale=16.0)
    names = ti.score_module_walk(kw)
    with pytest.raises(ValueError, match="noise_cond"):
        te._export({"params": {}}, names, kw)
