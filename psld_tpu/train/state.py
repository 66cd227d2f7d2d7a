"""Train state and optimizer construction.

Reference parity (main/models/wrapper.py:128-155): Adam with linear LR
warmup stepped per-optimizer-step, global-norm gradient clipping
(wrapper.py:82-85), and an on-device EMA of the score parameters
(callbacks.py:17-63) folded into the same jitted update.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


def _decay_mask(params):
    """Exclude frozen leaves from adamw weight decay.

    GaussianFourierProjection.W is a fixed buffer in the reference
    (requires_grad=False, layerspp.py:32-41); it lives in `params` here for
    uniform pytree handling, so it must be masked out of decay or a
    weight_decay>0 run would silently drift the frozen embedding.
    """
    def keep(path, _leaf):
        return not any(
            getattr(k, "key", None) is not None
            and str(k.key).startswith("GaussianFourierProjection")
            for k in path
        )

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(opt_config) -> optax.GradientTransformation:
    """Adam + warmup + global-norm clip (reference wrapper.py:128-155)."""
    if opt_config.name != "Adam":
        raise NotImplementedError(f"Optimizer {opt_config.name} not supported")
    warmup = int(opt_config.warmup)
    lr = float(opt_config.lr)
    if warmup > 0:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.constant_schedule(lr)],
            boundaries=[warmup],
        )
    else:
        schedule = optax.constant_schedule(lr)
    components = []
    grad_clip = float(opt_config.get("grad_clip", 0) or 0)
    if grad_clip != 0:
        components.append(optax.clip_by_global_norm(grad_clip))
    adam = optax.adamw(
        schedule,
        b1=float(opt_config.beta_1),
        b2=float(opt_config.beta_2),
        eps=float(opt_config.eps),
        weight_decay=float(opt_config.weight_decay),
        mask=_decay_mask,
    ) if float(opt_config.weight_decay) else optax.adam(
        schedule,
        b1=float(opt_config.beta_1),
        b2=float(opt_config.beta_2),
        eps=float(opt_config.eps),
    )
    components.append(adam)
    opt = optax.chain(*components)
    if bool(opt_config.get("flatten", False)):
        # optax.flatten runs the (elementwise) Adam update as ONE fused
        # pass over a single flat buffer instead of one kernel chain per
        # parameter leaf -- a bandwidth-bound-tail experiment
        # (PARITY.md: Adam/EMA ~20 ms of the train step). Opt-in because
        # the optimizer-state layout changes (a flat vector), which is
        # incompatible with existing checkpoints and with per-leaf FSDP
        # sharding annotations.
        opt = optax.flatten(opt)
        # optax.flatten's init reshapes+concatenates every leaf EAGERLY
        # (one dispatch per op) -- on remote/tunneled runtimes that is
        # hundreds of tiny device calls and the axon backend rejects the
        # op-by-op stream (measured: InvalidArgument on the 97.6M tree).
        # Compile the whole init into one program instead.
        opt = optax.GradientTransformation(jax.jit(opt.init), opt.update)
    return opt


def init_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # a real copy: the EMA must not alias the online params (aliased
        # leaves break buffer donation of the whole state)
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def ema_update(ema_params, params, tau: float):
    """targ = tau * targ + (1 - tau) * src (reference callbacks.py:62-63)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * tau + p.astype(e.dtype) * (1.0 - tau),
        ema_params,
        params,
    )
