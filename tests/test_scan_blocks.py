"""model.score_fn.scan_blocks: fold same-shape resblock runs into nn.scan.

The SOTA recipe unrolls 8 identical blocks per level (reference
scripts_psld/sota/uncond/cifar10/train_uncond_psld.sh:14); scanning them
shrinks the HLO ~8x where first-compile time is super-linear in program
size. These tests pin: (a) forward equivalence to the unscanned model
under the param-layout converters across the config matrix, (b) converter
round-trip exactness, (c) loss-trajectory parity through the real jitted
train step, (d) composition with remat and with the classifier trunk,
(e) the torch import/export bridge in the scanned layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

import psld_tpu

psld_tpu.import_modules_into_registry()

from psld_tpu.config import ConfigDict  # noqa: E402
from psld_tpu.models import scan_params as sp  # noqa: E402
from psld_tpu.models.ncsnpp import NCSNpp, NCSNppClassifier  # noqa: E402

BASE = dict(image_size=16, in_ch=2, out_ch=2, nf=8, ch_mult=(1, 2),
            num_res_blocks=3, attn_resolutions=(8,), dropout=0.0,
            embedding_type="positional")


def _flat(tree):
    return {jtu.keystr(k): np.asarray(v)
            for k, v in jtu.tree_leaves_with_path(tree)}


def _pair(kw):
    net_u = NCSNpp(**kw)
    net_s = NCSNpp(**kw, scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, kw["image_size"], kw["image_size"], kw["in_ch"])), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    p_u = net_u.init(jax.random.PRNGKey(0), x, t)
    abstract = jax.eval_shape(net_s.init, jax.random.PRNGKey(0), x, t)
    p_s = jax.tree.map(jnp.asarray, sp.to_scanned(p_u, abstract))
    return net_u, net_s, p_u, p_s, x, t


CASES = [
    {},  # biggan, naive resampling, attn at 8
    dict(resblock_type="ddpm"),
    dict(fir=True, embedding_type="fourier", progressive_input="residual"),
    dict(progressive="output_skip", progressive_input="input_skip",
         progressive_combine="cat", fir=True),
    dict(attn_resolutions=(8, 16)),  # attn inside every run
    dict(ch_mult=(1, 1, 2), num_res_blocks=2),
    dict(remat=True),  # remat composes inside the scan body
]


@pytest.mark.parametrize("over", CASES)
def test_forward_equivalence(over):
    kw = dict(BASE, **over)
    net_u, net_s, p_u, p_s, x, t = _pair(kw)
    out_u = net_u.apply(p_u, x, t)
    out_s = net_s.apply(p_s, x, t)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=2e-5, atol=2e-6)


def test_scan_actually_folds():
    _, net_s, _, p_s, x, t = _pair(dict(BASE))
    top = set(p_s["params"].keys())
    stacks = [k for k in top if sp.SCAN_RE.match(k)]
    assert stacks, "no scan stacks created for a foldable config"
    # every stack leaf carries the leading stack axis
    for k in stacks:
        n = int(sp.SCAN_RE.match(k).group(3))
        for leaf in jax.tree.leaves(p_s["params"][k]):
            assert leaf.shape[0] == n


def test_round_trip_exact():
    _, _, p_u, p_s, _, _ = _pair(dict(BASE))
    back = sp.from_scanned(p_s)
    d_u, d_b = _flat(p_u), _flat(back)
    assert set(d_u) == set(d_b)
    for k in d_u:
        np.testing.assert_array_equal(d_u[k], d_b[k])


def test_to_scanned_rejects_mismatched_tree():
    net_u, net_s, p_u, _, x, t = _pair(dict(BASE))
    abstract = jax.eval_shape(net_s.init, jax.random.PRNGKey(0), x, t)
    broken = dict(p_u["params"])
    broken["NotAModule_0"] = {"w": jnp.zeros((1,))}
    with pytest.raises(ValueError, match="no home"):
        sp.to_scanned({"params": broken}, abstract)


def test_scanned_init_has_distinct_slots():
    """split_rngs gives every slot its own init draw (like separate
    blocks), not a broadcast copy."""
    kw = dict(BASE)
    net_s = NCSNpp(**kw, scan_blocks=True)
    x = jnp.zeros((1, 16, 16, 2), jnp.float32)
    t = jnp.full((1,), 0.5, jnp.float32)
    p = net_s.init(jax.random.PRNGKey(0), x, t)
    stack = next(k for k in p["params"] if sp.SCAN_RE.match(k))
    leaf = next(a for a in jax.tree.leaves(p["params"][stack])
                if a.ndim >= 2 and float(jnp.abs(a).max()) > 0)
    assert float(jnp.abs(leaf[0] - leaf[1]).max()) > 0


def _train_cfg(scan):
    return ConfigDict({
        "data": {"image_size": 16, "num_channels": 1},
        "model": {
            "score_fn": dict(
                name="ncsnpp", in_ch=2, out_ch=2, nonlinearity="swish",
                nf=8, ch_mult=[1, 2], num_res_blocks=3,
                attn_resolutions=[8], dropout=0.0, resamp_with_conv=True,
                noise_cond=True, fir=False, fir_kernel=[1, 3, 3, 1],
                skip_rescale=True, resblock_type="biggan",
                progressive="none", progressive_input="none",
                progressive_combine="sum", embedding_type="positional",
                init_scale=0.0, fourier_scale=16.0, scan_blocks=scan),
            "sde": dict(name="psld", beta_min=8.0, beta_max=8.0, nu=4.01,
                        gamma=0.01, kappa=0.04, decomp_mode="lower",
                        numerical_eps=1e-9, n_timesteps=1000,
                        is_augmented=True),
        },
        "training": {
            "seed": 0, "continuous": True, "mode": "hsm",
            "train_eps": 1e-5, "use_ema": True, "ema_decay": 0.999,
            "grad_clip": 1.0,
            "loss": {"name": "psld_score_loss", "l_type": "l2",
                     "reduce_mean": True, "weighting": "fid"},
            "optimizer": {"name": "Adam", "lr": 1e-3, "beta_1": 0.9,
                          "beta_2": 0.999, "eps": 1e-8,
                          "warmup": 0, "weight_decay": 0.0},
        },
    })


def test_train_step_loss_trajectory_parity():
    """The scanned layout optimizes identically: same per-step losses
    through the REAL jitted train step with converted initial params."""
    from psld_tpu.registry import get_module
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    losses = {}
    for scan in (False, True):
        cfg = _train_cfg(scan)
        net = NCSNpp.from_config(cfg)
        sde = get_module("sde", "psld")(cfg)
        criterion = get_module("losses", "psld_score_loss")(cfg, sde)
        x = jnp.zeros((4, 16, 16, 1), jnp.float32)
        if scan:
            base_net = NCSNpp.from_config(_train_cfg(False))
            p0 = base_net.init(jax.random.PRNGKey(1), jnp.zeros(
                (1, 16, 16, 2), jnp.float32), jnp.full((1,), 0.5))
            abstract = jax.eval_shape(net.init, jax.random.PRNGKey(1),
                                      jnp.zeros((1, 16, 16, 2), jnp.float32),
                                      jnp.full((1,), 0.5))
            params = jax.tree.map(jnp.asarray, sp.to_scanned(p0, abstract))
        else:
            params = net.init(jax.random.PRNGKey(1), jnp.zeros(
                (1, 16, 16, 2), jnp.float32), jnp.full((1,), 0.5))
        step, optimizer = make_train_step(net, sde, criterion, cfg,
                                          donate=False)
        state = init_state(params, optimizer)
        batch = jnp.asarray(np.random.default_rng(5).standard_normal(
            (4, 16, 16, 1)), jnp.float32)
        rng = jax.random.PRNGKey(3)
        ls = []
        for i in range(4):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            ls.append(float(metrics["loss"]))
        losses[scan] = ls
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-7)


def test_torch_export_bridges_scanned_layout():
    """export_score_state_dict unstacks scan stacks transparently: the
    scanned layout exports the byte-identical reference state_dict."""
    from psld_tpu.train.torch_export import export_score_state_dict

    cfg_u, cfg_s = _train_cfg(False), _train_cfg(True)
    _, _, p_u, p_s, _, _ = _pair(dict(BASE))
    sd_u = export_score_state_dict(p_u, p_u, cfg_u)
    sd_s = export_score_state_dict(p_s, p_s, cfg_s)
    assert set(sd_u) == set(sd_s)
    for k in sd_u:
        np.testing.assert_array_equal(sd_u[k], sd_s[k])


def test_torch_import_restacks_scanned_layout():
    """_maybe_scan_layout (the convert_*_checkpoint hook) restacks the
    per-block tree the torch walk produces into the scanned layout."""
    from psld_tpu.models.ncsnpp import _model_kwargs
    from psld_tpu.train.torch_import import _maybe_scan_layout

    cfg_s = _train_cfg(True)
    kw = _model_kwargs(cfg_s)
    _, net_s, p_u, p_s, x, t = _pair(dict(BASE))
    got = _maybe_scan_layout(p_u, kw)
    d_got, d_want = _flat(got), _flat(p_s)
    assert set(d_got) == set(d_want)
    for k in d_got:
        np.testing.assert_array_equal(d_got[k], d_want[k])


def test_bf16_train_step():
    """training.bf16: the compiled step really runs bf16 convolutions
    (forward AND backward), master weights stay f32, and the loss tracks
    the f32 step closely."""
    from psld_tpu.registry import get_module
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    losses = {}
    for bf16 in (False, True):
        cfg = _train_cfg(False)
        cfg["training"]["bf16"] = bf16
        net = NCSNpp.from_config(cfg)
        sde = get_module("sde", "psld")(cfg)
        criterion = get_module("losses", "psld_score_loss")(cfg, sde)
        params = net.init(jax.random.PRNGKey(1), jnp.zeros(
            (1, 16, 16, 2), jnp.float32), jnp.full((1,), 0.5))
        step, optimizer = make_train_step(net, sde, criterion, cfg,
                                          donate=False)
        state = init_state(params, optimizer)
        batch = jnp.asarray(np.random.default_rng(5).standard_normal(
            (4, 16, 16, 1)), jnp.float32)
        if bf16:
            hlo = jax.jit(step).lower(
                state, batch, jax.random.PRNGKey(3)).as_text()
            assert "bf16" in hlo and "convolution" in hlo
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        losses[bf16] = float(metrics["loss"])
        assert np.isfinite(losses[bf16])
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.05)


def test_classifier_scan_forward_equivalence():
    kw = dict(BASE, n_cls=5)
    kw.pop("out_ch")
    net_u = NCSNppClassifier(**kw, out_ch=2)
    net_s = NCSNppClassifier(**kw, out_ch=2, scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 16, 16, 2)), jnp.float32)
    t = jnp.asarray([0.2, 0.9], jnp.float32)
    p_u = net_u.init(jax.random.PRNGKey(0), x, t)
    abstract = jax.eval_shape(net_s.init, jax.random.PRNGKey(0), x, t)
    p_s = jax.tree.map(jnp.asarray, sp.to_scanned(p_u, abstract))
    np.testing.assert_allclose(np.asarray(net_u.apply(p_u, x, t)),
                               np.asarray(net_s.apply(p_s, x, t)),
                               rtol=2e-5, atol=2e-6)


def test_hw_dropout_composes_with_scan():
    """dropout_impl=hw inside an nn.scan'd block stack: split_rngs must
    hand every scanned block a DISTINCT mask stream (the seed is traced
    through the scan carry), the train step must run and differentiate,
    and deterministic (eval) mode must bypass the op entirely."""
    from psld_tpu.registry import get_module
    from psld_tpu.train.state import init_state
    from psld_tpu.train.steps import make_train_step

    cfg = _train_cfg(True)
    cfg["model"]["score_fn"]["dropout"] = 0.5
    cfg["model"]["score_fn"]["dropout_impl"] = "hw"
    net = NCSNpp.from_config(cfg)
    sde = get_module("sde", "psld")(cfg)
    criterion = get_module("losses", "psld_score_loss")(cfg, sde)
    x = jnp.zeros((2, 16, 16, 2), jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    step, optimizer = make_train_step(net, sde, criterion, cfg,
                                      donate=False)
    state = init_state(params, optimizer)
    batch = jnp.asarray(np.random.default_rng(5).standard_normal(
        (4, 16, 16, 1)), jnp.float32)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))

    # distinct masks per scanned block: a train-mode forward with a fixed
    # input must differ across dropout keys (stream actually used) ...
    xin = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 16, 16, 2)), jnp.float32)
    y1 = net.apply(params, xin, t, train=True,
                   rngs={"dropout": jax.random.PRNGKey(11)})
    y2 = net.apply(params, xin, t, train=True,
                   rngs={"dropout": jax.random.PRNGKey(12)})
    assert float(jnp.abs(y1 - y2).max()) > 0
    # ... and eval mode must be rng-free and deterministic
    e1 = net.apply(params, xin, t, train=False)
    e2 = net.apply(params, xin, t, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
