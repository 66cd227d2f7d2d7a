"""Sampler abstractions (reference main/samplers/base.py:4-31).

TPU-native contract: ``sample(key, batch, ts, n_steps, denoise, eps)`` is a
pure jittable function -- the reverse-time loop is a single ``lax.scan`` so
the whole trajectory compiles to one XLA program with zero host sync per step
(the reference loops in Python, samplers/sde.py:43-57). ``score_fn`` is a
``(z, t) -> eps_pred`` closure (typically EMA params bound to net.apply).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from psld_tpu.utils.numerics import time_dtype


def make_timesteps(n_steps: int, eval_eps: float, t_max: float = 1.0,
                   stride_type: str = "uniform") -> jax.Array:
    """ts grid of length ``n_steps + 1`` (reference wrapper.py:101-114)."""
    t_final = t_max - eval_eps
    ts = jnp.linspace(0.0, t_final, n_steps + 1, dtype=time_dtype())
    if stride_type == "uniform":
        return ts
    if stride_type == "quadratic":
        return t_final * jnp.flip(1.0 - (ts / t_final) ** 2)
    raise ValueError(f"Unknown stride type: {stride_type}")


def supports_segments(sampler) -> bool:
    """Whether ``sampler`` implements the segmented protocol
    (``segment_init / segment_xs / segment_body / segment_finalize``) —
    every fixed-grid sampler does (the SDE family, rk_ode, ei_ode /
    cc_ei_ode); the host-loop bb_ode cannot be row-segmented
    (adaptive_ode has its own bounded-dispatch protocol,
    ``adaptive_init/run/finalize``).

    CONTRACT: ``segment_init`` and ``segment_finalize`` may use their
    ``ts`` argument only for its DTYPE (grid values belong in
    ``segment_xs``). The eval driver exploits this by passing a 1-row
    slice, which keeps the compiled init/finalize programs independent
    of NFE — a sampler x NFE sweep then compiles each sampler's programs
    once (byte-identity across dispatch boundaries is pinned by
    tests/test_e2e_pipeline.py)."""
    return all(hasattr(sampler, m) for m in
               ("segment_init", "segment_xs", "segment_body",
                "segment_finalize"))


def slice_segments(xs, rows_per_dispatch: int):
    """Host-slice a segmented sampler's ``segment_xs`` pytree into
    ceil(n_rows / rows_per_dispatch) row chunks — the one place the
    dispatch-boundary arithmetic lives (generate/serve/likelihood and
    :func:`segmented_sample` all chain these chunks through the same
    scan body). Chunks of equal length share one compiled program."""
    n_rows = int(jax.tree_util.tree_leaves(xs)[0].shape[0])
    step = rows_per_dispatch if rows_per_dispatch > 0 else n_rows
    return [jax.tree_util.tree_map(lambda a: a[i:i + step], xs)
            for i in range(0, n_rows, step)]


def segmented_sample(sampler, key, batch, ts, denoise=True, eps=1e-3,
                     rows_per_dispatch: int = 0):
    """``sampler.sample`` split into ceil(n_rows / rows_per_dispatch)
    chained ``lax.scan`` dispatches carrying (state, key) — the body and
    the grid rows are IDENTICAL to the single-scan program, only dispatch
    boundaries move, so trajectories are bit-identical (pinned by
    tests/test_samplers.py). Rationale: the tunneled TPU runtime kills
    any single dispatch >~60 s (CLAUDE.md), which made big
    (batch x NFE) sampling points unmeasurable; the eval drivers expose
    this as ``evaluation.nfe_per_dispatch``.
    """
    carry = sampler.segment_init(key, batch, ts, denoise, eps)
    xs = sampler.segment_xs(ts, denoise, eps)
    for chunk in slice_segments(xs, rows_per_dispatch):
        carry, _ = jax.lax.scan(sampler.segment_body, carry, chunk)
    return sampler.segment_finalize(carry, ts, denoise, eps)


class Sampler(abc.ABC):
    def __init__(self, config, sde, score_fn, corrector_fn=None):
        self.config = config
        self.sde = sde
        self.score_fn = score_fn
        self.corrector_fn = corrector_fn
        # stochastic correctors (Langevin) take a PRNG key as a 4th arg;
        # the reference's (x, t, dt) contract (base.py:22-27) stays valid
        self._corrector_keyed = False
        if corrector_fn is not None:
            import inspect

            try:
                n_params = len(inspect.signature(corrector_fn).parameters)
            except (TypeError, ValueError):
                n_params = 3
            self._corrector_keyed = n_params >= 4

    @property
    def n_steps(self) -> int:
        return int(self.config.evaluation.n_discrete_steps)

    def corrector_update_fn(self, x, t, dt, key=None):
        if self.corrector_fn is not None:
            if self._corrector_keyed:
                return self.corrector_fn(x, t, dt, key)
            return self.corrector_fn(x, t, dt)
        return x, x

    def _tvec(self, t, batch: int):
        return jnp.full((batch,), t, dtype=time_dtype())

    @abc.abstractmethod
    def sample(self, key, batch, ts, n_discrete_steps, denoise=True,
               eps=1e-3):
        ...
