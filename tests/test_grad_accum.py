"""Gradient accumulation (training.grad_accum, train/steps.py): the
compiled step averages microbatch gradients inside a lax.scan so few chips
can run recipes written for many GPUs (the reference's effective batches
assume an 8-GPU DDP node, reference main/train_sde.py:114). Covers: wiring
parity vs an independently composed average, composition with FSDP /
multi-step dispatch / the real loop, and optimizer-step-granular tail
dropping."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from psld_tpu.train.state import init_state, make_optimizer
from psld_tpu.train.steps import make_train_step, sample_times

from test_fsdp import _gather
from test_train_step import tiny_setup


def _with_accum(cfg, a):
    cfg = type(cfg)(cfg.to_dict()) if hasattr(cfg, "to_dict") else cfg
    cfg.training["grad_accum"] = a
    return cfg


def test_accum_step_matches_composed_average():
    """The accum-A step equals: average the A microbatch (loss, grad)
    pairs drawn with the documented fold_in streams, then apply ONE
    optimizer update."""
    A, B = 3, 8
    cfg, sde, net, criterion, params = tiny_setup()
    accum_cfg = _with_accum(cfg, A)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(5)
    batch = jax.random.normal(jax.random.PRNGKey(9), (A, B, 8, 8, 3),
                              jnp.float32)

    step_fn, opt = make_train_step(net, sde, criterion, accum_cfg,
                                   donate=False)
    state = replicate(init_state(params, opt), mesh)
    out_state, metrics = step_fn(
        state, shard_batch(batch, mesh, batch_axis=1), rng)

    # independent composition of the same primitives
    train_eps = float(cfg.training.train_eps)

    def loss_fn(p, b, t, k):
        return criterion(b, t,
                         lambda z, tt: net.apply(p, z, tt, train=True,
                                                 rngs={"dropout": k}), k)

    k_t, k_loss = jax.random.split(jax.random.fold_in(rng, 0))
    losses, grads = [], []
    for i in range(A):
        t = sample_times(jax.random.fold_in(k_t, i), B, train_eps, sde.T)
        l, g = jax.value_and_grad(loss_fn)(
            params, batch[i], t, jax.random.fold_in(k_loss, i))
        losses.append(float(l))
        grads.append(g)
    avg_g = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / A, *grads)
    optimizer = make_optimizer(cfg.training.optimizer)
    s0 = init_state(params, optimizer)
    updates, _ = optimizer.update(avg_g, s0.opt_state, params)
    want_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                         updates)

    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-5)
    for a, b in zip(_gather(want_params), _gather(out_state.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_accum_composes_with_fsdp_and_spd():
    """grad_accum under FSDP shardings and inside the K-step dispatch runs
    and matches the unsharded accum trajectory."""
    from psld_tpu.parallel.fsdp import shard_tree, tree_shardings
    from psld_tpu.train.steps import make_multi_train_step

    A, B, K = 2, 8, 2
    cfg, sde, net, criterion, params = tiny_setup()
    accum_cfg = _with_accum(cfg, A)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(5)
    batches = jax.random.normal(jax.random.PRNGKey(9), (K, A, B, 8, 8, 3),
                                jnp.float32)

    # replicated reference: K sequential accum steps
    step_fn, opt = make_train_step(net, sde, criterion, accum_cfg,
                                   donate=False)
    s_ref = replicate(init_state(params, opt), mesh)
    ref_losses = []
    for i in range(K):
        s_ref, m = step_fn(
            s_ref, shard_batch(batches[i], mesh, batch_axis=1), rng)
        ref_losses.append(float(m["loss"]))

    # FSDP + multi-step dispatch
    pshard = tree_shardings(params, mesh, min_size=0)
    multi_fn, opt2 = make_multi_train_step(net, sde, criterion, accum_cfg,
                                           K, donate=False,
                                           param_shardings=pshard)
    s2 = shard_tree(init_state(params, opt2), mesh, min_size=0)
    s2, m2 = multi_fn(s2, shard_batch(batches, mesh, batch_axis=2), rng)

    np.testing.assert_allclose(np.asarray(m2["loss"]),
                               np.asarray(ref_losses, np.float32),
                               rtol=1e-4)
    for a, b in zip(_gather(s_ref.params), _gather(s2.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def _loop_cfg(workdir, extra):
    from psld_tpu.config import compose

    results = str(workdir / "results")
    return compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={workdir}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=2",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
    ] + extra).dataset.diffusion, results


def test_train_loop_grad_accum_e2e(tmp_path):
    """The real loop with grad_accum=2 (+ spd=2, + spatial=2): one
    optimizer step consumes 2 microbatches; step counting is
    optimizer-step-granular."""
    from psld_tpu.train.loop import train_sde

    cfg, results = _loop_cfg(tmp_path, [
        "+dataset.diffusion.training.grad_accum=2",
        "+dataset.diffusion.training.steps_per_dispatch=2",
        "+dataset.diffusion.training.spatial=2",
    ])
    state = train_sde(cfg, max_steps=4)
    assert int(state.step) == 4
    assert np.isfinite(float(jnp.sum(
        jax.tree_util.tree_leaves(state.params)[0])))
    assert glob.glob(f"{results}/checkpoints/*epoch*")


def test_train_loop_grad_accum_drops_partial_tail(tmp_path, caplog):
    """A synthetic epoch whose microbatch count is not a multiple of
    grad_accum drops the tail instead of training a smaller effective
    batch."""
    import logging

    from psld_tpu.train.loop import train_sde

    # synthetic dataset: 512 samples; global microbatch = 2*8 = 16 ->
    # 32 microbatches per epoch; grad_accum=5 -> 6 steps + 2 dropped
    cfg, results = _loop_cfg(tmp_path, [
        "+dataset.diffusion.training.grad_accum=5",
    ])
    with caplog.at_level(logging.INFO, logger="psld_tpu.train.loop"):
        state = train_sde(cfg)
    assert int(state.step) == 6
    assert any("dropping 2 tail microbatches" in r.message
               for r in caplog.records)


def test_partial_tail_drop_is_logged_even_with_full_groups(tmp_path,
                                                           caplog):
    """spd=4, accum=3: the epoch's last chunk holds 8 microbatches = 2
    full groups + 2 dropped -- the drop must be logged even though
    training continues with the full groups (32 mb -> 10 optimizer
    steps)."""
    import logging

    from psld_tpu.train.loop import train_sde

    cfg, results = _loop_cfg(tmp_path, [
        "+dataset.diffusion.training.grad_accum=3",
        "+dataset.diffusion.training.steps_per_dispatch=4",
    ])
    with caplog.at_level(logging.INFO, logger="psld_tpu.train.loop"):
        state = train_sde(cfg)
    assert int(state.step) == 10
    assert any("dropping 2 tail microbatches" in r.message
               for r in caplog.records)
