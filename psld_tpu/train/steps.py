"""Jitted training steps.

One compiled program per step does: sample t ~ U[train_eps, T] (float64
per-batch scalars, reference wrapper.py:72-73) -> loss -> grad -> global-norm
clip -> Adam(+warmup) -> EMA lerp, with buffers donated. Under a
``jax.sharding.Mesh`` the batch is sharded on its leading axis and XLA
inserts the gradient all-reduce over ICI (no DDP process boundary; cf.
reference train_sde.py:114).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from psld_tpu.train.state import TrainState, ema_update
from psld_tpu.utils.numerics import time_dtype


def sample_times(rng, batch: int, train_eps: float, t_max: float = 1.0):
    """t ~ U[train_eps, T] in the time dtype (reference wrapper.py:72-73)."""
    u = jax.random.uniform(rng, (batch,), time_dtype())
    return u * (t_max - train_eps) + train_eps


def make_train_step(net, sde, criterion, config, donate: bool = True,
                    param_shardings=None) -> Callable:
    """Build the jitted score-model train step.

    Returns ``step(state, batch, rng) -> (state, metrics)``; ``batch`` is the
    *global* batch (shard its leading axis for data parallelism).

    ``param_shardings`` (a pytree of NamedShardings matching ``params``)
    turns on FSDP: gradients, updated params, and the EMA are pinned to the
    sharded layout so XLA reduce-scatters gradients and keeps the optimizer
    update fully sharded (see ``parallel/fsdp.py``).
    """
    train_eps = float(config.training.train_eps)
    tau = float(config.training.ema_decay)
    use_ema = bool(config.training.use_ema)
    # training.grad_accum=A: ``batch`` becomes A stacked microbatches
    # [A, B, ...]; grads average over a lax.scan (one microbatch's
    # activations live at a time -- the optimizer sees the full effective
    # batch A*B, letting few chips run recipes written for many GPUs)
    accum = int(config.training.get("grad_accum", 1))
    # training.bf16: mixed-precision compute — params and activations cast
    # to bf16 at the network boundary (so the backward's input-/filter-
    # gradient convolutions AND all activation traffic run in bf16), while
    # master weights, Adam moments, EMA, loss math, and the SDE coefficient
    # pipeline stay f32. The cast's VJP returns f32 gradients.
    bf16 = bool(config.training.get("bf16", False))
    from psld_tpu.train.state import make_optimizer

    optimizer = make_optimizer(config.training.optimizer)

    # training.remat acts at MODEL build time (per-resblock nn.remat, see
    # build_score_model) -- whole-network jax.checkpoint here was measured
    # NOT to reduce peak HBM (the full forward rematerializes at once)

    def loss_fn(params, batch, t, rng):
        if bf16:
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
        else:
            p = params

        def score_fn(z, tt):
            z = z.astype(jnp.bfloat16) if bf16 else z
            out = net.apply(p, z, tt, train=True, rngs={"dropout": rng})
            return out.astype(jnp.float32)

        return criterion(batch, t, score_fn, rng)

    def step(state: TrainState, batch, rng):
        k_t, k_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        if accum > 1:
            def body(carry, xs):
                i, b = xs
                t = sample_times(jax.random.fold_in(k_t, i), b.shape[0],
                                 train_eps, sde.T)
                loss_i, g_i = jax.value_and_grad(loss_fn)(
                    state.params, b, t, jax.random.fold_in(k_loss, i))
                loss_a, g_a = carry
                g_a = jax.tree_util.tree_map(lambda a, g: a + g, g_a, g_i)
                return (loss_a + loss_i.astype(jnp.float32), g_a), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zeros),
                (jnp.arange(accum), batch))
            loss = loss / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        else:
            t = sample_times(k_t, batch.shape[0], train_eps, sde.T)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                      t, k_loss)
        if param_shardings is not None:
            # FSDP: force the reduce-scatter of the data-parallel gradient
            # sum back to the parameter shards before the optimizer update
            grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        ema_params = (
            ema_update(state.ema_params, params, tau)
            if use_ema
            else params
        )
        if param_shardings is not None:
            params = jax.lax.with_sharding_constraint(params, param_shardings)
            ema_params = jax.lax.with_sharding_constraint(ema_params,
                                                          param_shardings)
        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=ema_params, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": jnp.sqrt(
                sum(jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree_util.tree_leaves(grads))
            ),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums), optimizer


def make_multi_train_step(net, sde, criterion, config, n_steps: int,
                          donate: bool = True,
                          param_shardings=None) -> Callable:
    """``step(state, batches, rng) -> (state, metrics)`` running ``n_steps``
    train steps in ONE compiled dispatch via ``lax.scan``.

    ``batches`` stacks ``n_steps`` global batches on a new leading axis.
    Numerically equivalent to ``n_steps`` sequential single-step dispatches
    (same per-step RNG stream via ``fold_in(rng, state.step)``; params match
    to XLA fusion-order ulps), but pays dispatch/tunnel latency once -- on
    remote runtimes a single-step loop can spend more wall-clock on
    round-trips than on compute. Metrics are scanned (shape [n_steps]).
    """
    single, optimizer = make_train_step(net, sde, criterion, config,
                                        donate=False,
                                        param_shardings=param_shardings)

    def step(state: TrainState, batches, rng):
        def body(state, batch):
            state, metrics = single(state, batch, rng)
            return state, metrics

        return jax.lax.scan(body, state, batches)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums), optimizer


def make_multi_clf_train_step(net, sde, criterion, config, n_steps: int,
                              donate: bool = True) -> Callable:
    """Classifier analogue of :func:`make_multi_train_step`:
    ``step(state, xs, ys, rng)`` scans ``n_steps`` clf train steps in one
    dispatch over step-stacked inputs."""
    single, optimizer = make_clf_train_step(net, sde, criterion, config,
                                            donate=False)

    def step(state: TrainState, xs, ys, rng):
        def body(state, batch):
            x, y = batch
            state, metrics = single(state, x, y, rng)
            return state, metrics

        return jax.lax.scan(body, state, (xs, ys))

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums), optimizer


def make_clf_train_step(net, sde, criterion, config,
                        donate: bool = True) -> Callable:
    """Classifier train step (reference clf_wrapper.py:61-75): automatic
    optimization, logs loss + top-1 accuracy."""
    train_eps = float(config.clf.training.get("train_eps",
                                              config.diffusion.training.train_eps))
    # same mixed-precision contract as the score step: bf16 params +
    # activations inside the network, f32 logits/CE/optimizer
    bf16 = bool(config.clf.training.get(
        "bf16", config.diffusion.training.get("bf16", False)))
    from psld_tpu.train.state import make_optimizer

    optimizer = make_optimizer(config.clf.training.optimizer)

    def loss_fn(params, x, y, t, rng):
        if bf16:
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
        else:
            p = params

        def clf_fn(z, tt):
            z = z.astype(jnp.bfloat16) if bf16 else z
            out = net.apply(p, z, tt, train=True, rngs={"dropout": rng})
            return out.astype(jnp.float32)

        return criterion(x, y, t, clf_fn, rng)

    def step(state: TrainState, x, y, rng):
        k_t, k_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        t = sample_times(k_t, x.shape[0], train_eps, sde.T)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, y, t, k_loss
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=state.ema_params,
                               opt_state=opt_state)
        return new_state, {"loss": loss, "top1": acc}

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums), optimizer
