"""Full-loop sampler parity against the ACTUAL reference sampler classes.

Drives the reference EulerMaruyamaSampler / SSCSSampler
(/root/reference/main/samplers/sde.py:9,227 -- plain torch, no Lightning)
with the reference PSLD SDE (/root/reference/main/models/sde/psld.py) on a
tiny NCSN++ whose weights are SHARED with the flax net (via the gold-tested
torch_import conversion), feeding both loops the SAME per-step noise
sequence, and asserts end-state trajectory agreement with the JAX
single-lax.scan sampler programs.

This closes the inferential gap between "coefficients oracle-matched" and
"the whole loop is the same map": step ordering, time grid, denoise row,
dt handling, and score-call conventions are all on the hook here.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import psld_tpu

psld_tpu.import_modules_into_registry()

torch = pytest.importorskip("torch")

from test_torch_import import (  # noqa: E402
    REF_DIR, make_cfg, needs_reference, ref_song)  # noqa: F401

from psld_tpu.config import ConfigDict  # noqa: E402
from psld_tpu.registry import get_module  # noqa: E402
from psld_tpu.sde.psld import PSLD  # noqa: E402
from psld_tpu.train import torch_import as ti  # noqa: E402

REF_MAIN = "/root/reference/main"

SDE_KW = dict(beta_min=8.0, beta_max=8.0, nu=4.01, gamma=0.01, kappa=0.04,
              decomp_mode="lower", numerical_eps=1e-9, n_timesteps=1000)


@pytest.fixture(scope="module")
def ref_core():
    """Reference PSLD SDE + sampler classes imported with the top-level
    `util` registry stubbed (same synthetic-package trick as ref_song;
    package __init__ files are bypassed so torchdiffeq/Lightning imports
    never run)."""
    util_stub = types.ModuleType("util")

    def register_module(category=None, name=None):
        def deco(cls):
            return cls

        return deco

    def reshape(t, rt):
        # transcription of reference util.reshape (main/util.py:13-22)
        if len(rt.shape) == len(t.shape):
            return t
        ones = [1] * len(rt.shape[1:])
        return t.view(-1, *ones)

    util_stub.register_module = register_module
    util_stub.reshape = reshape

    sde_pkg = types.ModuleType("refsdepkg")
    sde_pkg.__path__ = [os.path.join(REF_MAIN, "models", "sde")]
    samp_pkg = types.ModuleType("refsamppkg")
    samp_pkg.__path__ = [os.path.join(REF_MAIN, "samplers")]

    saved = {k: sys.modules.get(k)
             for k in ("util", "refsdepkg", "refsamppkg")}
    sys.modules["util"] = util_stub
    sys.modules["refsdepkg"] = sde_pkg
    sys.modules["refsamppkg"] = samp_pkg
    try:
        psld_mod = importlib.import_module("refsdepkg.psld")
        samp_mod = importlib.import_module("refsamppkg.sde")
        yield types.SimpleNamespace(psld=psld_mod, samplers=samp_mod)
    finally:
        for k in [m for m in sys.modules
                  if m.startswith(("refsdepkg", "refsamppkg"))]:
            sys.modules.pop(k, None)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _shared_net(ref_song):  # noqa: F811
    """Tiny reference NCSN++ (torch) + the SAME weights in flax via the
    gold-tested import path. in_ch=2 = phase space of a 1-channel image."""
    from psld_tpu.models.ncsnpp import NCSNpp, _model_kwargs

    cfg = make_cfg(num_res_blocks=1, nf=8)
    torch.manual_seed(0)
    ref_net = ref_song.ncsnpp.NCSNpp(cfg).eval()
    kw = _model_kwargs(cfg)
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    params = ti._convert(sd, ti.score_module_walk(kw), kw)
    net = NCSNpp(**kw)
    return ref_net, net, params


def _configs():
    jcfg = ConfigDict({
        "data": {"image_size": 16, "num_channels": 1},
        "model": {"sde": dict(SDE_KW, name="psld")},
        "evaluation": {"n_discrete_steps": 8, "denoise": True,
                       "eval_eps": 1e-3, "stride_type": "uniform"},
    })
    rcfg = ConfigDict({
        "model": {"sde": dict(SDE_KW)},
        "evaluation": {"n_discrete_steps": 8},
    })
    return jcfg, rcfg


def _em_noise_schedule(key, n_rows, shape):
    """Replays the JAX EM scan's RNG stream host-side: per row,
    key, sub = split(key); noise = normal(sub, shape, f32)."""
    noises = []
    for _ in range(n_rows):
        key, sub = jax.random.split(key)
        noises.append(np.asarray(
            jax.random.normal(sub, shape, jnp.float32)))
    return noises


def _sscs_noise_schedule(key, n_steps, shape):
    """Per step: key, sub = split(key); k1, k2 = split(sub); two draws."""
    noises = []
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        k1, k2 = jax.random.split(sub)
        noises.append(np.asarray(jax.random.normal(k1, shape, jnp.float32)))
        noises.append(np.asarray(jax.random.normal(k2, shape, jnp.float32)))
    return noises


def _fake_randn_like(noises_nhwc):
    queue = [torch.from_numpy(
        np.ascontiguousarray(n.transpose(0, 3, 1, 2))) for n in noises_nhwc]

    def fake(x):
        if not queue:  # reference denoise draws-and-discards one extra
            return torch.zeros_like(x)
        return queue.pop(0).to(x.dtype)

    return fake


def _run_pair(ref_song, ref_core, sampler_name, monkeypatch):  # noqa: F811
    ref_net, net, params = _shared_net(ref_song)
    jcfg, rcfg = _configs()
    n = int(jcfg.evaluation.n_discrete_steps)
    eps = float(jcfg.evaluation.eval_eps)

    sde_j = PSLD(jcfg)
    sde_r = ref_core.psld.PSLD(rcfg)

    ts = np.linspace(0.0, sde_j.T - eps, n + 1)
    u0 = np.random.default_rng(3).standard_normal(
        (2, 16, 16, 2)).astype(np.float32)
    key = jax.random.PRNGKey(42)

    # --- JAX single-scan program ---
    sampler_j = get_module("samplers", sampler_name)(
        jcfg, sde_j, lambda z, t: net.apply(params, z, t))
    out_j = np.asarray(jax.jit(
        lambda k, b: sampler_j.sample(k, b, jnp.asarray(ts), n,
                                      denoise=True, eps=eps)
    )(key, jnp.asarray(u0)))

    # --- reference torch loop, fed the identical noise sequence ---
    if sampler_name == "em_sde":
        noises = _em_noise_schedule(key, n, u0.shape)
        ref_cls = ref_core.samplers.EulerMaruyamaSampler
    else:
        noises = _sscs_noise_schedule(key, n, u0.shape)
        ref_cls = ref_core.samplers.SSCSSampler
    monkeypatch.setattr(torch, "randn_like", _fake_randn_like(noises))

    def ref_score(u, t):
        with torch.no_grad():
            return ref_net(u, t)

    sampler_r = ref_cls(rcfg, sde_r, ref_score)
    u0_t = torch.from_numpy(np.ascontiguousarray(u0.transpose(0, 3, 1, 2)))
    out_r = sampler_r.sample(u0_t, torch.from_numpy(ts), n,
                             denoise=True, eps=eps)
    out_r = out_r.detach().numpy().transpose(0, 2, 3, 1)

    assert np.abs(out_j).max() > 0.1  # non-degenerate trajectory
    np.testing.assert_allclose(out_j, out_r, rtol=1e-4, atol=1e-4)


@needs_reference
def test_em_trajectory_matches_reference(ref_song, ref_core, monkeypatch):  # noqa: F811
    _run_pair(ref_song, ref_core, "em_sde", monkeypatch)


@needs_reference
def test_sscs_trajectory_matches_reference(ref_song, ref_core, monkeypatch):  # noqa: F811
    _run_pair(ref_song, ref_core, "sscs_sde", monkeypatch)


def _shared_clf(ref_song):  # noqa: F811
    """Tiny reference classifier (torch) + the same weights in flax."""
    from psld_tpu.models.ncsnpp import NCSNppClassifier, _model_kwargs_clf

    cfg = make_cfg(clf=True, num_res_blocks=1, nf=8)
    torch.manual_seed(1)
    ref_clf = ref_song.ncsnpp_clf.NCSNppClassifier(cfg).eval()
    kw = _model_kwargs_clf(cfg)
    sd = {k: v.detach().numpy() for k, v in ref_clf.state_dict().items()}
    params = ti._convert(sd, ti.clf_module_walk(kw), kw, clf_head=True)
    net = NCSNppClassifier(**kw)
    return ref_clf, net, params


def _run_guided(ref_song, ref_core, monkeypatch, convention):  # noqa: F811
    """Drive the ACTUAL reference ClassCondEulerMaruyamaSampler
    (main/samplers/sde.py:61-122) with shared score + classifier weights
    and an identical noise stream, under both classifier-time conventions:

    - ``reference``: the reference loop verbatim (clf conditioned on raw
      sampler time, sde.py:87-88) — bit-reproduces published guided
      behavior with imported reference classifiers.
    - ``diffusion``: clf conditioned on T - t; the reference loop is
      reproduced by wrapping its clf_fn with the time flip, proving the
      toggle changes exactly the classifier's conditioning time and
      nothing else.
    """
    ref_net, net, params = _shared_net(ref_song)
    ref_clf, clf_net, clf_params = _shared_clf(ref_song)
    jcfg, rcfg = _configs()
    jcfg["evaluation"]["sampler"] = {"clf_time_convention": convention}
    jcfg["clf"] = {"evaluation": {"label_to_sample": 1, "clf_temp": 2.0}}
    rcfg["clf"] = {"evaluation": {"label_to_sample": 1, "clf_temp": 2.0}}
    n = int(jcfg.evaluation.n_discrete_steps)
    eps = float(jcfg.evaluation.eval_eps)

    sde_j = PSLD(jcfg)
    sde_r = ref_core.psld.PSLD(rcfg)

    ts = np.linspace(0.0, sde_j.T - eps, n + 1)
    u0 = np.random.default_rng(7).standard_normal(
        (2, 16, 16, 2)).astype(np.float32)
    key = jax.random.PRNGKey(11)

    sampler_j = get_module("samplers", "cc_em_sde")(
        jcfg, sde_j, lambda z, t: net.apply(params, z, t),
        clf_fn=lambda z, t: clf_net.apply(clf_params, z, t))
    assert sampler_j.clf_time_convention == convention
    out_j = np.asarray(jax.jit(
        lambda k, b: sampler_j.sample(k, b, jnp.asarray(ts), n,
                                      denoise=True, eps=eps)
    )(key, jnp.asarray(u0)))

    # guided EM consumes one noise per row incl. the denoise row (the
    # reference's denoise predictor draws-and-discards, sde.py:117-121)
    noises = _em_noise_schedule(key, n + 1, u0.shape)
    monkeypatch.setattr(torch, "randn_like", _fake_randn_like(noises))

    def ref_score(u, t):
        with torch.no_grad():
            return ref_net(u, t)

    T = float(sde_r.T)
    if convention == "reference":
        ref_clf_fn = ref_clf
    else:
        def ref_clf_fn(u, t):  # flip to diffusion time
            return ref_clf(u, T - t)

    sampler_r = ref_core.samplers.ClassCondEulerMaruyamaSampler(
        rcfg, sde_r, ref_score, clf_fn=ref_clf_fn)
    u0_t = torch.from_numpy(np.ascontiguousarray(u0.transpose(0, 3, 1, 2)))
    out_r = sampler_r.sample(u0_t, torch.from_numpy(ts), n,
                             denoise=True, eps=eps)
    out_r = out_r.detach().numpy().transpose(0, 2, 3, 1)

    assert np.abs(out_j).max() > 0.1
    np.testing.assert_allclose(out_j, out_r, rtol=1e-4, atol=1e-4)
    return out_j


@needs_reference
def test_guided_trajectory_matches_reference_convention(
        ref_song, ref_core, monkeypatch):  # noqa: F811
    _run_guided(ref_song, ref_core, monkeypatch, "reference")


@needs_reference
def test_guided_trajectory_matches_diffusion_convention(
        ref_song, ref_core, monkeypatch):  # noqa: F811
    out_d = _run_guided(ref_song, ref_core, monkeypatch, "diffusion")
    out_r = _run_guided(ref_song, ref_core, monkeypatch, "reference")
    # the two conventions are genuinely different trajectories
    assert np.abs(out_d - out_r).max() > 1e-6
