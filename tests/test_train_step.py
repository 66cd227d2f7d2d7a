"""Train-step tests: optimization fixed points, EMA semantics, warmup
schedule, and data-parallel execution on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.config import ConfigDict
from psld_tpu.losses import PSLDScoreLoss
from psld_tpu.models.ncsnpp import NCSNpp
from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from psld_tpu.sde.psld import PSLD
from psld_tpu.train.state import init_state, make_optimizer, ema_update
from psld_tpu.train.steps import make_train_step, sample_times


def tiny_setup(batch=8):
    cfg = ConfigDict({
        "data": {"image_size": 8, "num_channels": 3},
        "model": {
            "score_fn": {"name": "ncsnpp", "in_ch": 6, "out_ch": 6,
                         "nonlinearity": "swish", "nf": 8, "ch_mult": [1, 2],
                         "num_res_blocks": 1, "attn_resolutions": [4],
                         "dropout": 0.0, "resamp_with_conv": True,
                         "noise_cond": True, "fir": False,
                         "fir_kernel": [1, 3, 3, 1], "skip_rescale": True,
                         "resblock_type": "biggan", "progressive": "none",
                         "progressive_input": "none",
                         "progressive_combine": "sum",
                         "embedding_type": "positional", "init_scale": 0.0,
                         "fourier_scale": 16},
            "sde": {"name": "psld", "beta_min": 8, "beta_max": 8, "nu": 4.01,
                    "gamma": 0.01, "kappa": 0.04, "decomp_mode": "lower",
                    "numerical_eps": 1e-9, "n_timesteps": 1000},
        },
        "training": {"mode": "hsm", "train_eps": 1e-5, "use_ema": True,
                     "ema_decay": 0.999, "seed": 0,
                     "loss": {"name": "psld_score_loss", "l_type": "l2",
                              "reduce_mean": True, "weighting": "fid"},
                     "optimizer": {"name": "Adam", "lr": 1e-3, "beta_1": 0.9,
                                   "beta_2": 0.999, "weight_decay": 0,
                                   "eps": 1e-8, "warmup": 10,
                                   "grad_clip": 1.0}},
    })
    sde = PSLD(cfg)
    net = NCSNpp.from_config(cfg)
    criterion = PSLDScoreLoss(cfg, sde)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 8, 8, 6), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x,
                      jnp.full((batch,), 0.5, jnp.float32))
    return cfg, sde, net, criterion, params


def test_sample_times_range():
    t = sample_times(jax.random.PRNGKey(0), 10_000, 1e-5)
    t = np.asarray(t)
    assert t.dtype == np.float64
    assert t.min() >= 1e-5 and t.max() <= 1.0
    np.testing.assert_allclose(t.mean(), 0.5, atol=2e-2)


def test_train_step_descends_and_counts():
    cfg, sde, net, criterion, params = tiny_setup()
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=False)
    state = init_state(params, optimizer)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3),
                              jnp.float32)
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    # overfitting a fixed batch must reduce loss substantially
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_flat_optimizer_matches_default():
    """training.optimizer.flatten=true (one fused pass over a flat buffer
    instead of per-leaf Adam kernel chains) must reproduce the default
    trajectory: Adam is elementwise, so only the global-norm clip's
    summation order differs (tiny float noise)."""
    cfg, sde, net, criterion, params = tiny_setup()
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3),
                              jnp.float32)
    rng = jax.random.PRNGKey(3)

    def run(flat):
        cfg.training.optimizer["flatten"] = flat
        step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                             donate=False)
        state = init_state(params, optimizer)
        losses = []
        for _ in range(10):
            state, metrics = step_fn(state, batch, rng)
            losses.append(float(metrics["loss"]))
        return losses, state

    base_losses, base_state = run(False)
    flat_losses, flat_state = run(True)
    np.testing.assert_allclose(flat_losses, base_losses, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        base_state.params, flat_state.params)
    cfg.training.optimizer["flatten"] = False


def test_flat_optimizer_rejected_under_fsdp(tmp_path):
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    import pytest

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.epochs=1",
        f"dataset.diffusion.training.results_dir={tmp_path}/r",
        "+dataset.diffusion.training.fsdp=true",
        "+dataset.diffusion.training.optimizer.flatten=true",
    ]).dataset.diffusion
    with pytest.raises(ValueError, match="flatten"):
        train_sde(cfg, max_steps=1)


def test_multi_step_dispatch_matches_sequential():
    """K steps in one lax.scan dispatch == K single dispatches: losses
    bitwise-equal (same fold_in(rng, state.step) stream), params equal up
    to XLA fusion-order ulps."""
    from psld_tpu.train.steps import make_multi_train_step

    cfg, sde, net, criterion, params = tiny_setup()
    rng = jax.random.PRNGKey(3)
    batches = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 8, 3),
                                jnp.float32)

    single_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False)
    s1 = init_state(params, opt)
    losses_seq = []
    for i in range(4):
        s1, m = single_fn(s1, batches[i], rng)
        losses_seq.append(float(m["loss"]))

    multi_fn, opt2 = make_multi_train_step(net, sde, criterion, cfg, 4,
                                           donate=False)
    s2 = init_state(params, opt2)
    s2, m2 = multi_fn(s2, batches, rng)

    assert int(s2.step) == int(s1.step) == 4
    np.testing.assert_array_equal(np.asarray(m2["loss"]),
                                  np.asarray(losses_seq, np.float32))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-8)


def test_train_loop_steps_per_dispatch_e2e(tmp_path):
    """The loop runs with steps_per_dispatch > 1 (incl. the epoch tail that
    is narrower than the dispatch width) and writes a checkpoint."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=4",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
        "+dataset.diffusion.training.steps_per_dispatch=3",
        f"dataset.diffusion.training.results_dir={results}",
    ]).dataset.diffusion
    # synthetic n=512 / global bs 32 = 16 steps: 5 full dispatches + 1 tail
    state = train_sde(cfg, max_steps=7)
    assert int(state.step) >= 7
    assert glob.glob(f"{results}/checkpoints/psld-*")


def test_clf_loop_steps_per_dispatch_e2e(tmp_path):
    import glob

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_clf

    results = str(tmp_path / "clf_results")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.clf.data.name=synthetic",
        f"dataset.clf.data.root={tmp_path}",
        "dataset.clf.data.image_size=16",
        "dataset.clf.data.return_target=True",
        "dataset.clf.model.clf_fn.nf=8",
        "dataset.clf.model.clf_fn.ch_mult=[1,2]",
        "dataset.clf.model.clf_fn.num_res_blocks=1",
        "dataset.clf.model.clf_fn.attn_resolutions=[8]",
        "dataset.clf.model.clf_fn.n_cls=10",
        "dataset.clf.training.batch_size=4",
        "dataset.clf.training.epochs=1",
        "dataset.clf.training.chkpt_interval=1",
        "+dataset.clf.training.steps_per_dispatch=3",
        f"dataset.clf.training.results_dir={results}",
    ]).dataset
    state = train_clf(cfg, max_steps=7)
    assert int(state.step) >= 7
    assert glob.glob(f"{results}/checkpoints/clf-*")


def test_remat_dropout_bit_identical(monkeypatch):
    """RematDropout (opt-in PSLD_DROPOUT_REMAT=1; measured slower
    on-chip, kept as the documented negative result) is bit-identical to
    stock nn.Dropout in value AND gradient — same rng path (both name
    their module Dropout_0), same bernoulli, same select; jax.checkpoint
    only changes what autodiff saves."""
    cfg, sde, net, criterion, params = tiny_setup()
    cfg.model.score_fn["dropout"] = 0.5  # make any mask mismatch loud
    from psld_tpu.models.ncsnpp import NCSNpp

    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 6), jnp.float32)
    t = jnp.full((4,), 0.4, jnp.float32)

    outs, grads = {}, {}
    for remat in (True, False):
        if remat:
            monkeypatch.setenv("PSLD_DROPOUT_REMAT", "1")
        else:
            monkeypatch.delenv("PSLD_DROPOUT_REMAT", raising=False)
        net_d = NCSNpp.from_config(cfg)
        p = net_d.init({"params": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)}, x, t, train=True)

        def loss(p):
            out = net_d.apply(p, x, t, train=True,
                              rngs={"dropout": jax.random.PRNGKey(9)})
            return jnp.sum(out ** 2)

        outs[remat] = np.asarray(net_d.apply(
            p, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(9)}))
        grads[remat] = jax.tree.leaves(jax.grad(loss)(p))

    np.testing.assert_array_equal(outs[False], outs[True])
    for a, b in zip(grads[False], grads[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clf_bf16_train_step(tmp_path):
    """training.bf16 reaches the classifier step too: bf16 convolutions in
    the compiled HLO, f32 master weights, loss tracking the f32 step."""
    from psld_tpu.config import compose
    from psld_tpu.registry import get_module
    from psld_tpu.train.loop import build_sde
    from psld_tpu.train.steps import make_clf_train_step

    losses = {}
    for bf16 in (False, True):
        cfg = compose([
            "+dataset=cifar10/cifar10_psld",
            f"dataset.clf.data.root={tmp_path}",
            "dataset.clf.data.image_size=16",
            "dataset.clf.model.clf_fn.nf=8",
            "dataset.clf.model.clf_fn.ch_mult=[1,2]",
            "dataset.clf.model.clf_fn.num_res_blocks=1",
            "dataset.clf.model.clf_fn.attn_resolutions=[8]",
            "dataset.clf.model.clf_fn.n_cls=10",
            f"+dataset.clf.training.bf16={bf16}",
        ]).dataset
        clf_cls = get_module("clf_fn", cfg.clf.model.clf_fn.name)
        net = clf_cls.from_config(cfg.clf)
        sde = build_sde(cfg.diffusion)
        criterion = get_module("losses", cfg.clf.training.loss.name)(cfg,
                                                                     sde)
        params = net.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 16, 16, 6), jnp.float32),
                          jnp.full((1,), 0.5, jnp.float32))
        step, optimizer = make_clf_train_step(net, sde, criterion, cfg,
                                              donate=False)
        from psld_tpu.train.state import init_state as _init
        state = _init(params, optimizer)
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (4, 16, 16, 3)), jnp.float32)
        y = jnp.asarray([0, 1, 2, 3], jnp.int32)
        if bf16:
            hlo = jax.jit(step).lower(
                state, x, y, jax.random.PRNGKey(3)).as_text()
            assert "bf16" in hlo and "convolution" in hlo
        state, metrics = step(state, x, y, jax.random.PRNGKey(3))
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        losses[bf16] = float(metrics["loss"])
        assert np.isfinite(losses[bf16])
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.05)


def test_clf_loop_restore_latest(tmp_path):
    """restore_path=latest works for the classifier loop too: fresh start
    when no checkpoint exists, then relaunch-the-same-command resume
    (train_sde gained this in round 2; the clf loop treated 'latest' as a
    literal path)."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_clf

    results = str(tmp_path / "clf_results")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.clf.data.name=synthetic",
        f"dataset.clf.data.root={tmp_path}",
        "dataset.clf.data.image_size=16",
        "dataset.clf.data.return_target=True",
        "dataset.clf.model.clf_fn.nf=8",
        "dataset.clf.model.clf_fn.ch_mult=[1,2]",
        "dataset.clf.model.clf_fn.num_res_blocks=1",
        "dataset.clf.model.clf_fn.attn_resolutions=[8]",
        "dataset.clf.model.clf_fn.n_cls=10",
        "dataset.clf.training.batch_size=4",
        "dataset.clf.training.epochs=1",
        "dataset.clf.training.chkpt_interval=1",
        "dataset.clf.training.restore_path=latest",
        f"dataset.clf.training.results_dir={results}",
    ]).dataset
    state = train_clf(cfg, max_steps=3)
    assert int(state.step) == 3
    assert glob.glob(f"{results}/checkpoints/clf-*")
    # relaunch the same command: resumes past the restored step count
    state = train_clf(cfg, max_steps=5)
    assert int(state.step) >= 5


def test_ema_tracks_params():
    cfg, sde, net, criterion, params = tiny_setup()
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=False)
    state = init_state(params, optimizer)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3),
                              jnp.float32)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    tau = 0.999
    np.testing.assert_allclose(
        np.asarray(e1), tau * np.asarray(p0) + (1 - tau) * np.asarray(p1),
        rtol=1e-5, atol=1e-7,
    )


def test_weight_decay_skips_frozen_fourier_W():
    """With weight_decay>0 (adamw), the frozen GaussianFourierProjection.W
    buffer must be bitwise unchanged after a step (it has zero grad via
    stop_gradient, so only decay could move it)."""
    cfg, sde, net, criterion, params = tiny_setup()
    cfg.model.score_fn.embedding_type = "fourier"
    cfg.training.optimizer.weight_decay = 0.1
    net = NCSNpp.from_config(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x0,
                      jnp.full((2,), 0.5, jnp.float32))

    def fourier_w(p):
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        ws = [leaf for path, leaf in flat
              if any("GaussianFourierProjection" in str(getattr(k, "key", ""))
                     for k in path)]
        assert len(ws) == 1
        return np.asarray(ws[0])

    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=False)
    state = init_state(params, optimizer)
    w0 = fourier_w(state.params).copy()
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3),
                              jnp.float32)
    for _ in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(fourier_w(state.params), w0)
    # sanity: decay is actually on for the rest of the net — some other
    # leaf moved
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(params)[0]))


def test_warmup_schedule():
    opt_cfg = ConfigDict({"name": "Adam", "lr": 1.0, "beta_1": 0.9,
                          "beta_2": 0.999, "weight_decay": 0, "eps": 1e-8,
                          "warmup": 100, "grad_clip": 0})
    opt = make_optimizer(opt_cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = opt.init(params)
    g = {"w": jnp.ones((4,))}
    # first step: lr ~ 0 (linear warmup from 0)
    upd, opt_state = opt.update(g, opt_state, params)
    assert float(jnp.abs(upd["w"]).max()) < 1e-2
    for _ in range(150):
        upd, opt_state = opt.update(g, opt_state, params)
    # post-warmup: Adam update magnitude ~ lr
    np.testing.assert_allclose(float(jnp.abs(upd["w"]).max()), 1.0, rtol=0.1)


def test_ema_update_pure():
    ema = {"w": jnp.zeros((2,))}
    p = {"w": jnp.ones((2,))}
    out = ema_update(ema, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


def test_data_parallel_step_on_mesh():
    """Same math, batch sharded over 8 CPU devices; result matches the
    unsharded run bit-for-bit in expectation (same global RNG)."""
    cfg, sde, net, criterion, params = tiny_setup(batch=16)
    step_fn, optimizer = make_train_step(net, sde, criterion, cfg,
                                         donate=False)
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 8, 3),
                              jnp.float32)
    rng = jax.random.PRNGKey(3)

    # unsharded
    state = init_state(params, optimizer)
    state_a, m_a = step_fn(state, batch, rng)

    # sharded over the mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state_b = replicate(init_state(params, optimizer), mesh)
    batch_b = shard_batch(batch, mesh)
    state_b, m_b = step_fn(state_b, batch_b, rng)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)[0]
    lb = jax.tree_util.tree_leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_remat_matches_baseline():
    """Per-resblock remat (nn.remat, training.remat=True) must not change
    parameter PATHS (checkpoint compatibility) nor the optimization:
    losses bitwise-equal, params near-identical."""
    cfg, sde, net, criterion, params = tiny_setup()
    step_plain, opt = make_train_step(net, sde, criterion, cfg, donate=False)

    net_r = net.clone(remat=True)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    params_r = net_r.init(jax.random.PRNGKey(1), x0,
                          jnp.full((2,), 0.5, jnp.float32))
    assert (jax.tree_util.tree_structure(params_r)
            == jax.tree_util.tree_structure(params))
    step_remat, _ = make_train_step(net_r, sde, criterion, cfg, donate=False)

    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 3),
                              jnp.float32)
    rng = jax.random.PRNGKey(3)
    s_a = init_state(params, opt)
    s_b = init_state(params, opt)
    for _ in range(3):
        s_a, m_a = step_plain(s_a, batch, rng)
        s_b, m_b = step_remat(s_b, batch, rng)
        assert float(m_a["loss"]) == float(m_b["loss"])
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_training_remat_flag_reaches_model():
    from psld_tpu.train.loop import build_score_model

    cfg, *_ = tiny_setup()
    assert build_score_model(cfg).remat is False
    cfg.training.remat = True
    assert build_score_model(cfg).remat is True
    # training.remat is authoritative: it can DISABLE a model-level remat
    cfg.training.remat = False
    cfg.model.score_fn.remat = True
    assert build_score_model(cfg).remat is False
