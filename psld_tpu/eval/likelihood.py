"""Exact likelihood via the probability-flow ODE.

New TPU-native capability: the reference implements ``prior_logp``
(main/models/sde/vpsde.py:91-95; left ``pass`` for PSLD, psld.py:372-373)
but never ships the likelihood pipeline that consumes it. This module
completes it the Song-SDE way: integrate the forward probability-flow ODE

    dz/dt = f(z, t) - 1/2 g(t)^2 score(z, t),
    d log p/dt = -div_z [ f - 1/2 g^2 score ](z, t)

from ``t = eps`` to ``T`` and evaluate ``log p(x) = prior_logp(z_T) +
int div``. Everything runs in one ``lax.scan`` (fixed-grid RK4/Heun, zero
host sync); the divergence uses either the exact Jacobian trace (tiny
shapes / tests) or the Hutchinson estimator with Rademacher probes drawn
once per trajectory — each probe is a single ``jax.jvp`` through the score
network, so the cost is (1 + n_probes * order * n_steps) forward-sized
evaluations.

For the augmented PSLD state the joint density ``p(x, m)`` is exact, and
``augmented_nll_bound`` turns it into the standard variational upper bound
on the data NLL (CLD-style): with ``q(m) = N(0, mm_0 I)``,

    -log p(x) <= E_{m~q}[-log p(x, m)] - H(q).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.utils.numerics import time_dtype


def _pf_drift(sde, score_fn, z, t):
    """Forward-time probability-flow drift at physical time ``t``.

    ``reverse_sde`` (psld.py:345-364) takes time measured from the prior
    end and returns ``-f + 1/2 g^2 score`` under probability_flow, so the
    forward drift is its negation evaluated at ``T - t``.
    """
    tv = jnp.broadcast_to(jnp.asarray(t, time_dtype()), (z.shape[0],))
    f_bar, _ = sde.reverse_sde(z, sde.T - tv, score_fn,
                               probability_flow=True)
    return -f_bar


def _divergence_exact(drift_fn, z, row_chunk: int = 32):
    """Exact per-sample divergence via the Jacobian trace (O(D) REVERSE-mode
    passes, ``row_chunk`` rows at a time).

    Reverse mode rather than jacfwd: the score network's Pallas attention
    ships a custom_vjp, and custom_vjp functions reject forward-mode
    autodiff — a learned NCSN++ score is only reverse-differentiable.

    The batch Jacobian is block-diagonal (per-sample independence), so for
    a basis cotangent ``e_i`` broadcast over the batch one ``vjp`` yields
    every sample's row ``J_b^T e_i`` at once, and ``trace(J_b) = sum_i
    (J_b^T e_i)_i``. ``lax.map(..., batch_size=row_chunk)`` bounds the
    live activation set to ``batch x row_chunk`` network pullbacks —
    ``jacrev`` instead vmaps over all D rows at once (effective batch
    ``B x D``; 19 GB of HBM for one 32x32x6 CIFAR batch of 4, the round-3
    learned-model OOM)."""
    b = z.shape[0]
    d = int(np.prod(z.shape[1:]))
    _, pullback = jax.vjp(drift_fn, z)

    def row(i):
        e = jnp.zeros((d,), z.dtype).at[i].set(1)
        (jte,) = pullback(jnp.broadcast_to(e.reshape((1,) + z.shape[1:]),
                                           z.shape))
        return jax.lax.dynamic_index_in_dim(jte.reshape(b, d), i, axis=1,
                                            keepdims=False)

    rows = jax.lax.map(row, jnp.arange(d), batch_size=min(row_chunk, d))
    return jnp.sum(rows, axis=0)


def _divergence_hutchinson(drift_fn, z, probes):
    """Hutchinson estimator: mean_v v^T (d drift/dz) v over Rademacher
    probes of shape [n_probes, *z.shape].

    Contracted REVERSE-mode: v^T J v == (J^T v) . v, so one vjp per probe
    gives the same scalar as the textbook jvp form — and vjp works through
    the Pallas attention's custom_vjp, which rejects jax.jvp (forward
    mode). Caught on the first learned-model NLL run (round 3)."""
    reduce_axes = tuple(range(1, z.ndim))
    _, pullback = jax.vjp(drift_fn, z)

    def one(v):
        (jtv,) = pullback(v)
        return jnp.sum(v * jtv, axis=reduce_axes)

    return jnp.mean(jax.vmap(one)(probes), axis=0)


def make_likelihood_fn(sde, score_fn, *, n_steps: int = 100,
                       eps: float = 1e-5, method: str = "rk4",
                       n_probes: int = 1, exact_div: bool = False,
                       exact_chunk: int = 32, stride: str = "quadratic"):
    """Build ``fn(key, x) -> dict`` computing log-likelihood statistics.

    Returns per-sample ``logp`` (nats, for the state as given — joint
    ``(x, m)`` when ``x`` carries 2C channels of an augmented SDE),
    ``prior_logp``, ``delta_logp`` and the terminal latent ``z_T``.
    Jit-compatible; wrap with ``jax.jit`` (key and x are traced).

    ``stride='quadratic'`` concentrates grid points near ``t = eps`` where
    the PF drift is stiff — for PSLD the momentum marginal variance starts
    at ``kappa * M`` (~0.01 for the paper's settings), so the score there
    is two orders of magnitude larger than at mid-trajectory (same
    motivation as the reference's quadratic sampling stride,
    wrapper.py:111-114).
    """
    assert method in ("euler", "heun", "rk4")
    assert stride in ("uniform", "quadratic")
    order = {"euler": 1, "heun": 2, "rk4": 4}[method]

    def rhs(z, t, probes):
        drift_fn = lambda zz: _pf_drift(sde, score_fn, zz, t)
        dz = drift_fn(z)
        if exact_div:
            div = _divergence_exact(drift_fn, z, row_chunk=exact_chunk)
        else:
            div = _divergence_hutchinson(drift_fn, z, probes)
        return dz, div

    # Segmented protocol (evaluation.likelihood.steps_per_dispatch): the
    # NLL integral is one fixed-grid scan just like the samplers', so the
    # same watchdog escape applies — the Hutchinson probes (drawn ONCE per
    # call) ride the carry so chained dispatches see the same estimator.
    def segment_ts():
        u = jnp.linspace(0.0, 1.0, n_steps + 1, dtype=time_dtype())
        if stride == "quadratic":
            u = u * u
        return eps + (sde.T - eps) * u

    def segment_init(key, x):
        probes = None
        if not exact_div:
            probes = (jax.random.rademacher(
                key, (n_probes,) + x.shape, jnp.int8)
            ).astype(x.dtype)
        logdet0 = jnp.zeros((x.shape[0],), time_dtype())
        return (x, logdet0, probes)

    def segment_body(carry, inp):
        z, logdet, probes = carry
        t, t_next = inp
        dt = t_next - t
        dt_c = dt.astype(z.dtype)
        k1, d1 = rhs(z, t, probes)
        if method == "euler":
            z_n = z + dt_c * k1
            ld = logdet + dt * d1
        elif method == "heun":
            k2, d2 = rhs(z + dt_c * k1, t_next, probes)
            z_n = z + dt_c * 0.5 * (k1 + k2)
            ld = logdet + dt * 0.5 * (d1 + d2)
        else:
            half = t + dt / 2
            k2, d2 = rhs(z + 0.5 * dt_c * k1, half, probes)
            k3, d3 = rhs(z + 0.5 * dt_c * k2, half, probes)
            k4, d4 = rhs(z + dt_c * k3, t_next, probes)
            z_n = z + dt_c / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            ld = logdet + dt / 6.0 * (d1 + 2 * d2 + 2 * d3 + d4)
        return (z_n, ld, probes), None

    def segment_finalize(carry):
        z_T, logdet, _ = carry
        prior = sde.prior_logp(z_T).astype(logdet.dtype)
        # instantaneous change of variables: along dz/dt = f_pf,
        # d log p_t(z_t)/dt = -div f_pf, so
        # log p_eps(x) = log p_T(z_T) + int_eps^T div f_pf dt
        logp = prior + logdet
        return {"logp": logp, "prior_logp": prior, "delta_logp": logdet,
                "z_T": z_T, "nfe": np.int32((1 if exact_div else n_probes)
                                            * order * n_steps)}

    def fn(key, x):
        ts = segment_ts()
        carry, _ = jax.lax.scan(segment_body, segment_init(key, x),
                                (ts[:-1], ts[1:]))
        return segment_finalize(carry)

    fn.segment_ts = segment_ts
    fn.segment_init = segment_init
    fn.segment_body = segment_body
    fn.segment_finalize = segment_finalize
    return fn


def bits_per_dim(nll_nats, data_dim: int, n_bits: int = 8) -> jax.Array:
    """Convert continuous-space NLL (nats per sample, data scaled to
    [-1, 1]) to discrete bits/dim for ``n_bits`` quantized data: each
    quantization bin has width 2/2^n_bits in model space."""
    nll_bits = nll_nats / (data_dim * math.log(2.0))
    return nll_bits + (n_bits - 1.0)


def evaluate_nll(config, max_batches: int | None = None):
    """Dataset NLL in bits/dim from a trained checkpoint.

    Entry-point-shaped like the reference eval drivers (eval/sample.py):
    restores EMA params via ``evaluation.chkpt_path``, walks the dataset
    unshuffled, and returns the mean bits/dim. For augmented SDEs (PSLD)
    the reported number is the variational upper bound of
    :func:`augmented_nll_bound`; for VP-SDE it is exact (up to the
    Hutchinson estimator and the fixed RK grid).

    Optional knobs under ``evaluation.likelihood``: n_steps (100), solver
    (rk4|heun|euler), n_probes (1), exact_div (False — exact Jacobian
    trace instead of Hutchinson), exact_chunk (32 trace rows live at
    once), eps (1e-5), stride, steps_per_dispatch (0 = one scan; K > 0
    chains the same body over K-row grid chunks, bit-identical, for
    per-dispatch watchdog runtimes) — all read with defaults so the
    reference config surface is unchanged.
    ``evaluation.n_samples`` caps how much of the dataset is evaluated.
    """
    import logging

    from psld_tpu.data.loader import EpochLoader, get_dataset
    from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    logger = logging.getLogger(__name__)

    from psld_tpu.eval.generate import load_eval_state, make_score_fn
    from psld_tpu.train.loop import build_sde

    sde = build_sde(config)
    net, params = load_eval_state(config)

    lcfg = config.evaluation.get("likelihood", None)
    get = (lambda k, d: lcfg.get(k, d)) if lcfg is not None else (
        lambda k, d: d)

    from psld_tpu.eval.generate import eval_bf16

    bf16 = eval_bf16(config)

    def make_lik(p):
        return make_likelihood_fn(
            sde, make_score_fn(net, p, bf16=bf16),
            n_steps=int(get("n_steps", 100)),
            eps=float(get("eps", 1e-5)), method=str(get("solver", "rk4")),
            n_probes=int(get("n_probes", 1)),
            exact_div=bool(get("exact_div", False)),
            exact_chunk=int(get("exact_chunk", 32)),
            stride=str(get("stride", "quadratic")))

    def fn_with_params(p, key, z):
        lik = make_lik(p)
        if sde.is_augmented:
            nll, out = augmented_nll_bound(sde, lik, key, z)
        else:
            out = lik(key, z)
            nll = -out["logp"]
        return nll

    nll_jit = jax.jit(fn_with_params)

    # evaluation.likelihood.steps_per_dispatch=K: chain the SAME scan body
    # over host-sliced grid chunks (bit-identical to the single scan; the
    # probes ride the carry) so a big (batch x n_steps x order) NLL point
    # never exceeds a per-dispatch watchdog — the likelihood analogue of
    # evaluation.nfe_per_dispatch (samplers/base.py::segmented_sample).
    spd = int(get("steps_per_dispatch", 0) or 0)

    mesh = make_mesh()
    params = replicate(params, mesh)
    per_step = int(config.evaluation.batch_size) * mesh.devices.size
    dataset = get_dataset(config)
    loader = EpochLoader(dataset, per_step, shuffle=False, drop_last=True,
                         hflip=False)
    key = jax.random.PRNGKey(int(config.evaluation.seed))

    n_cap = int(config.evaluation.get("n_samples", 0) or 0)
    if n_cap:
        cap_batches = max(1, n_cap // per_step)
        max_batches = (min(max_batches, cap_batches)
                       if max_batches is not None else cap_batches)

    if spd > 0:
        from psld_tpu.samplers.base import slice_segments

        ts = make_lik(params).segment_ts()
        # device-resident once — the grid never changes across batches
        chunks = slice_segments((jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])),
                                spd)

        def _init(p, k, x):
            # fold the variational momentum draw into the same jit so the
            # augmented path (PSLD's default) stays off the eager dispatch
            # floor — only the final entropy subtraction runs on host
            lik = make_lik(p)
            if sde.is_augmented:
                z, k_l = augmented_draw(sde, k, x)
                return lik.segment_init(k_l, z)
            return lik.segment_init(k, x)

        init_jit = jax.jit(_init)
        seg_jit = jax.jit(lambda p, c, ch: jax.lax.scan(
            make_lik(p).segment_body, c, ch)[0])
        fin_jit = jax.jit(lambda p, c: -make_lik(p).segment_finalize(
            c)["logp"])

        def nll_call(k, x):
            carry = init_jit(params, k, x)
            for ch in chunks:
                carry = seg_jit(params, carry, ch)
            nll = fin_jit(params, carry)
            if sde.is_augmented:
                nll = nll - augmented_entropy_q(sde, x.shape)
            return nll
    else:
        nll_call = lambda k, x: nll_jit(params, k, x)

    dim = None
    nlls = []
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        x = shard_batch(jnp.asarray(batch), mesh)
        dim = dim or int(np.prod(x.shape[1:]))
        nlls.append(np.asarray(nll_call(jax.random.fold_in(key, i), x)))
        if (i + 1) % 10 == 0:
            running = float(np.mean(bits_per_dim(
                jnp.asarray(np.concatenate(nlls)), dim)))
            logger.info("nll: %d batches, %.4f bits/dim", i + 1, running)
    bpd = float(np.mean(np.asarray(
        bits_per_dim(jnp.asarray(np.concatenate(nlls)), dim))))
    logger.info("final: %.4f bits/dim over %d samples", bpd,
                sum(a.size for a in nlls))
    return bpd


def augmented_draw(sde, key, x):
    """The variational bound's momentum draw: ``m ~ q = N(0, mm_0 I)``
    concatenated onto ``x`` in phase space; returns (z, key for the
    likelihood integral)."""
    k_m, k_l = jax.random.split(key)
    m = jax.random.normal(k_m, x.shape, x.dtype) * np.sqrt(sde.mm_0)
    return jnp.concatenate([x, m], axis=-1), k_l


def augmented_entropy_q(sde, x_shape) -> float:
    """Entropy of the momentum proposal q (nats per sample)."""
    dim_m = int(np.prod(x_shape[1:]))
    return 0.5 * dim_m * (np.log(2.0 * np.pi * sde.mm_0) + 1.0)


def augmented_nll_bound(sde, likelihood_fn, key, x):
    """Variational upper bound on the data NLL for augmented (phase-space)
    SDEs: draw ``m ~ q = N(0, mm_0 I)``, evaluate the exact joint NLL, and
    subtract the entropy of ``q``. Returns (nll_bound, aux dict)."""
    z, k_l = augmented_draw(sde, key, x)
    out = likelihood_fn(k_l, z)
    nll_bound = -out["logp"] - augmented_entropy_q(sde, x.shape)
    return nll_bound, out
