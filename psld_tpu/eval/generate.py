"""Sampling / guided-sampling / inpainting drivers
(reference main/eval/{sample,class_cond_sample,inpaint}.py).

One jitted sampler program per run; the sample count is fanned out in
batches of ``batch_size * n_devices`` with the batch axis sharded over the
mesh. Per-batch RNG diversity comes from ``fold_in(seed, batch_idx)``
(replacing the reference's per-rank reseeding, wrapper.py:93-99).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from psld_tpu.data.datasets import InpaintDataset, SDELatentDataset
from psld_tpu.data.loader import get_dataset
from psld_tpu.eval.writers import InpaintingImageWriter, SimpleImageWriter
from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from psld_tpu.registry import get_module
from psld_tpu.samplers.base import make_timesteps
from psld_tpu.samplers.correctors import build_corrector
from psld_tpu.train import checkpoint as ckpt
from psld_tpu.train.loop import (build_clf_model, build_score_model,
                                 build_sde, init_score_params)
from psld_tpu.train.state import init_state, make_optimizer
from psld_tpu.utils.pipeline import consume_stream

logger = logging.getLogger(__name__)


def load_eval_state(config, net=None):
    """Restore a TrainState from evaluation.chkpt_path and pick the EMA or
    online params per ``evaluation.sample_from`` (reference eval/sample.py:38-69)."""
    net = net or build_score_model(config)
    params = init_score_params(net, config, int(config.evaluation.seed))
    optimizer = make_optimizer(config.training.optimizer)
    abstract = init_state(params, optimizer)
    state = ckpt.restore_checkpoint(str(config.evaluation.chkpt_path),
                                    abstract)
    use_ema = str(config.evaluation.sample_from) == "target"
    if use_ema:
        # measured trap (v5e, 3k-step run): before the EMA settles it is a
        # lagged average over fast-moving params -- OFF-MANIFOLD weights
        # that sample pure noise (TV 0.49) while the online params sample
        # structure (TV 0.09). Settling needs step >> 1/(1-decay).
        tau = float(config.training.ema_decay)
        step = int(state.step)
        horizon = int(5.0 / max(1e-12, 1.0 - tau))
        if step < horizon:
            logger.warning(
                "sample_from=target after only %d train steps: the EMA "
                "(decay=%s, time constant %d steps) is still a lagged "
                "average over moving params and can sample pure noise -- "
                "use sample_from=source or a smaller ema_decay for short "
                "runs", step, tau, int(1.0 / max(1e-12, 1.0 - tau)))
    return net, (state.ema_params if use_ema else state.params)


def eval_bf16(config) -> bool:
    """``evaluation.bf16``: bfloat16 inference for the samplers. The SDE
    transition math stays f32/f64 — only the network runs bf16."""
    return bool(config.evaluation.get("bf16", False))


def make_score_fn(net, params, bf16: bool = False):
    """Inference score function; ``bf16=True`` casts params + input to
    bfloat16 at the network boundary (f32 output for the SDE math).
    Measured +14.3% on the flagship 1000-NFE sampler (halved weight
    traffic per scan step) at ΔTV 0.0000 sample quality, +11% at 256px;
    enabled via ``evaluation.bf16`` (PARITY round-3 §2)."""
    if not bf16:
        return lambda z, t: net.apply(params, z, t)
    p16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    return lambda z, t: net.apply(
        p16, z.astype(jnp.bfloat16), t).astype(jnp.float32)


def _rank_info(config):
    """(rank, num_processes, lockstep) for sampling fan-out.

    Two fan-out modes:
    - Per-rank (reference parity, Lightning DDP predict where each of 8
      ranks runs independently and writes its own files,
      callbacks.py:98-122): independent single-process jobs told their
      coordinates via ``evaluation.rank`` / ``evaluation.num_processes``;
      rank-folded RNG streams.
    - Lockstep SPMD (multi-controller jax runtime, PSLD_MULTIHOST): ONE
      global program over every process's devices; all processes run the
      identical dispatch loop with identical keys, sample diversity comes
      from position in the global array, and each process writes only its
      addressable shard (tagged with its process index)."""
    ecfg = config.evaluation
    rank = int(ecfg.get("rank", -1))
    nproc = int(ecfg.get("num_processes", 0))
    if nproc <= 0 and rank < 0 and jax.process_count() > 1:
        return jax.process_index(), 1, True
    if nproc <= 0:
        nproc = jax.process_count()
    if rank < 0:
        rank = jax.process_index()
    if not rank < nproc:
        raise ValueError(f"rank {rank} out of range for {nproc} processes")
    return rank, nproc, False


def _fetch_local(out, take):
    """This process's rows of a (possibly non-fully-addressable) global
    batch, clipped to the global tail ``take``, in global row order.

    Under spatial sharding a row is split into height segments across the
    process's devices; segments are stitched back (grouped by batch
    offset, ordered by height offset, deduped against replicas)."""
    segs: dict = {}
    for s in out.addressable_shards:
        b0 = s.index[0].start or 0
        h0 = (s.index[1].start or 0) if len(s.index) > 1 else 0
        segs.setdefault(b0, {})[h0] = s.data
    parts = []
    for b0 in sorted(segs):
        blocks = [np.asarray(segs[b0][h0]) for h0 in sorted(segs[b0])]
        block = blocks[0] if len(blocks) == 1 else np.concatenate(blocks,
                                                                  axis=1)
        n = min(take - b0, block.shape[0])
        if n > 0:
            parts.append(block[:n])
    if not parts:
        return np.zeros((0,) + out.shape[1:], out.dtype)
    return np.concatenate(parts)


def _run_sampler(config, sde, sampler_factory, params, writer, batch_source,
                 write_extra_batch: bool = False, param_source=None,
                 prefix_source=None, jit_cache=None, latent=None):
    """``sampler_factory(params) -> Sampler``; params are threaded through
    jit as arguments -- closing over 100M-param pytrees would embed them as
    constants in the XLA program (and overflow remote-compile payloads).

    ``latent`` (an SDELatentDataset) replaces ``batch_source`` for
    prior-seeded generation: the prior draw is TRACED INTO the compiled
    program (sharded via with_sharding_constraint), so a dispatch is one
    async call -- no per-batch host latent generation, device_put, or
    multi-host assembly. Bitwise-identical outputs: jax.random is
    deterministic under tracing.

    ``param_source(batch_idx, replicated_params)`` may swap cheap per-batch
    leaves (e.g. the guidance label) into the jit arguments without
    recompiling; ``prefix_source(batch_idx)`` may retarget the writer's
    sample prefix per batch (label-tagged filenames).

    Fan-out mechanics:
    - Every device dispatch is the full ``batch_size * n_devices`` width;
      tail batches are generated full-width and sliced host-side, so a
      non-divisible n_samples causes NO recompile and stays sharded.
    - Writes are double-buffered: batch k+1 is dispatched before batch k's
      result is fetched and PNG-encoded, overlapping host encoding with
      device compute.
    - Multi-process: each rank takes ceil(n_samples / num_processes)
      samples, derives its RNG stream via fold_in(seed, rank) (mirroring
      the reference's seed_everything(seed + global_rank),
      wrapper.py:93-99), and writes rank-tagged filenames; nothing is
      gathered across processes.
    - ``jit_cache`` (a dict owned by the caller, e.g. the FID-vs-NFE
      sweep) lets repeated calls share compiled sampler programs: the
      timestep grid is a traced jit ARGUMENT, so combinations differing
      only in stride VALUES (same NFE) reuse one XLA program.
    """
    ecfg = config.evaluation
    denoise = bool(ecfg.denoise)
    n_steps = int(ecfg.n_discrete_steps)
    n_eff = n_steps - 1 if denoise else n_steps  # reference wrapper.py:51-54
    ts = make_timesteps(n_eff, float(ecfg.eval_eps), sde.T,
                        str(ecfg.stride_type))

    # evaluation.spatial=S shards the image height over a second mesh axis
    # (activation-parallel inference for high-res models; same mechanism as
    # training.spatial — parallel/spatial.py)
    sp = int(ecfg.get("spatial", 1))
    if sp > 1:
        from psld_tpu.parallel.spatial import (check_divisible,
                                               make_spatial_mesh)

        mesh = make_spatial_mesh(sp)
        check_divisible(int(config.data.image_size), mesh)
    else:
        mesh = make_mesh()
    per_step = int(ecfg.batch_size) * int(mesh.shape["data"])
    if sp > 1:
        from psld_tpu.parallel.spatial import spatial_batch_sharding

        b_sharding = spatial_batch_sharding(mesh)
    else:
        from psld_tpu.parallel.mesh import batch_sharding

        b_sharding = batch_sharding(mesh)
    rank, nproc, lockstep = _rank_info(config)
    if lockstep and sp > 1:
        # lockstep works when each spatial group stays inside one process:
        # a process then holds FULL rows (as height segments _fetch_local
        # stitches) and still writes only its own samples
        local = jax.local_device_count()
        if sp > local or local % sp:
            raise NotImplementedError(
                f"evaluation.spatial={sp} must divide the LOCAL device "
                f"count {local} under a multi-controller runtime: spatial "
                "groups cannot span processes")
    n_samples = -(-int(ecfg.n_samples) // nproc)  # this rank's share
    seed = int(ecfg.seed)
    key = jax.random.PRNGKey(seed)
    if nproc > 1:
        key = jax.random.fold_in(key, rank)
    params = replicate(params, mesh)

    sampler_name = str(ecfg.sampler.name)
    is_host_loop = sampler_name == "bb_ode"
    reports_nfe = sampler_name == "adaptive_ode"
    eps = float(ecfg.eval_eps)
    # evaluation.nfe_per_dispatch=K: split the trajectory scan into
    # ceil(n_rows/K) chained dispatches carrying (state, key) — the scan
    # body and grid rows are unchanged (bit-identical trajectories,
    # tests/test_samplers.py), only dispatch boundaries move. Needed for
    # big (batch x NFE) points on runtimes with a per-dispatch watchdog
    # (the tunneled v5e kills single dispatches >~60 s; the reference's
    # Python loop never had a ceiling, main/samplers/sde.py:38-58).
    nfe_pd = int(ecfg.get("nfe_per_dispatch", 0) or 0)
    if lockstep and (latent is None or is_host_loop):
        raise NotImplementedError(
            "under a multi-controller jax runtime only prior-seeded "
            "on-device samplers run lockstep (em_sde/sscs_sde/sscs2m_sde/"
            "rk_ode/adaptive_ode/ei_ode); for inpainting or bb_ode launch "
            "one single-process job per rank with evaluation.rank=R "
            "evaluation.num_processes=N")
    if is_host_loop:
        sampler = sampler_factory(params)
    else:
        from psld_tpu.samplers.base import supports_segments

        if nfe_pd > 0 and not reports_nfe and \
                not supports_segments(sampler_factory(params)):
            logger.warning(
                "evaluation.nfe_per_dispatch=%d ignored: sampler %s has no "
                "segmented scan", nfe_pd, sampler_name)
            nfe_pd = 0
        # per_step and b_sharding are baked into the compiled closure, so
        # they must be part of the cache identity too
        cache_key = (sampler_name, n_eff, denoise, eps, latent is not None,
                     per_step, sp, nfe_pd,
                     str(ecfg.sampler.get("solver", "")),
                     int(ecfg.sampler.get("order", 2)),
                     int(ecfg.sampler.get("quad_panels", 6)),
                     int(ecfg.sampler.get("quad_nodes", 16)),
                     str(ecfg.sampler.get("corrector", "none")),
                     int(ecfg.sampler.get("corrector_steps", 1)),
                     float(ecfg.sampler.get("corrector_snr", 0.16)))
        # Segmented programs are NFE-independent: the scan body is traced
        # per chunk SHAPE (shared across NFE values with the same
        # nfe_per_dispatch), and init/finalize receive a 1-row slice of the
        # grid (the segment contract allows ts use for dtype only,
        # samplers/base.py) — so a sampler x NFE sweep compiles each
        # sampler's programs ONCE instead of once per NFE. This is what
        # makes the FID-vs-NFE study cheap on remote-compile backends.
        seg_sig = cache_key[:1] + ("segfns",) + cache_key[2:]  # drop n_eff
        if nfe_pd > 0 and not reports_nfe and jit_cache is not None \
                and seg_sig in jit_cache:
            sample_jit = jit_cache[seg_sig]
        elif jit_cache is not None and cache_key in jit_cache:
            sample_jit = jit_cache[cache_key]
        elif nfe_pd > 0 and reports_nfe:
            # adaptive_ode bounded-dispatch protocol: the while_loop carry
            # (y, k1, t, h, nfe, steps) chains across host dispatches, each
            # capped at nfe_per_dispatch // 6 controller iterations (6 NFE
            # per iteration) — the adaptive analogue of the fixed-grid
            # segmentation, bit-identical to the unbounded loop
            # (samplers/ode.py adaptive_init/run/finalize).
            iters_pd = max(1, nfe_pd // 6)

            if latent is not None:
                def _ainit(params, k, ts_):
                    b = latent.sample_batch(k, per_step)
                    b = jax.lax.with_sharding_constraint(b, b_sharding)
                    return sampler_factory(params).adaptive_init(b, eps)
            else:
                def _ainit(params, k, b, ts_):
                    return sampler_factory(params).adaptive_init(b, eps)

            def _arun(params, carry):
                return sampler_factory(params).adaptive_run(
                    carry, eps, max_iters=iters_pd)

            def _afin(params, carry):
                return sampler_factory(params).adaptive_finalize(
                    carry, denoise=denoise, eps=eps)

            sample_jit = ("adaseg", jax.jit(_ainit), jax.jit(_arun),
                          jax.jit(_afin))
            if jit_cache is not None:
                jit_cache[cache_key] = sample_jit
        elif nfe_pd > 0:
            # segmented: (init, K x scan-chunk, finalize) jits; chunks of
            # equal length share one compiled program (<= 2 programs)
            if latent is not None:
                def _init(params, k, ts_):
                    b = latent.sample_batch(k, per_step)
                    b = jax.lax.with_sharding_constraint(b, b_sharding)
                    return sampler_factory(params).segment_init(
                        k, b, ts_, denoise, eps)
            else:
                def _init(params, k, b, ts_):
                    return sampler_factory(params).segment_init(
                        k, b, ts_, denoise, eps)

            def _seg(params, carry, chunk):
                return jax.lax.scan(sampler_factory(params).segment_body,
                                    carry, chunk)[0]

            def _fin(params, carry, ts_):
                return sampler_factory(params).segment_finalize(
                    carry, ts_, denoise, eps)

            sample_jit = ("seg", jax.jit(_init), jax.jit(_seg),
                          jax.jit(_fin))
            if jit_cache is not None:
                jit_cache[seg_sig] = sample_jit
        else:
            def _sample_with(s, k, b, ts_):
                if reports_nfe:
                    # on-device adaptive solve: NFE counter rides the carry
                    return s.sample_with_nfe(k, b, denoise=denoise, eps=eps)
                return s.sample(k, b, ts_, n_eff, denoise=denoise, eps=eps)

            if latent is not None:
                def _run(params, k, ts_):
                    b = latent.sample_batch(k, per_step)
                    b = jax.lax.with_sharding_constraint(b, b_sharding)
                    return _sample_with(sampler_factory(params), k, b, ts_)
            else:
                def _run(params, k, b, ts_):
                    return _sample_with(sampler_factory(params), k, b, ts_)

            sample_jit = jax.jit(_run)
            if jit_cache is not None:
                jit_cache[cache_key] = sample_jit

        chunks = None
        if isinstance(sample_jit, tuple) and sample_jit[0] == "seg":
            # grid rows are host-sliced from the CURRENT ts on every
            # _run_sampler call — a jit_cache hit across stride VALUES
            # (the cache_key deliberately omits them; the jits trace ts /
            # the chunk rows) must not reuse a previous grid's chunks
            from psld_tpu.samplers.base import slice_segments

            chunks = slice_segments(
                sampler_factory(params).segment_xs(ts, denoise, eps), nfe_pd)

        def _dispatch(p, k_batch, batch):
            """One full trajectory: single scan, the chained segmented
            dispatches (every call is async — segments queue back-to-back),
            or the adaptive bounded-dispatch loop (each dispatch syncs on
            the scalar t to decide whether the solve is done)."""
            if isinstance(sample_jit, tuple) and sample_jit[0] == "adaseg":
                _, init_jit, run_jit, fin_jit = sample_jit
                carry = (init_jit(p, k_batch, ts) if latent is not None
                         else init_jit(p, k_batch, batch, ts))
                t_end_val = float(sde.T) - eps
                max_steps = sampler_factory(params).max_steps
                prev_steps = -1
                while True:
                    carry = run_jit(p, carry)
                    steps_now = int(carry[5])
                    # zero-progress dispatch => the DEVICE's while cond is
                    # false (solve done). This is the authoritative break:
                    # re-deriving the cond on the host from fetched f64
                    # scalars proved backend-sensitive (on the tunneled
                    # runtime the host compare can disagree by an ulp and
                    # spin no-op dispatches forever).
                    if steps_now == prev_steps:
                        break
                    prev_steps = steps_now
                    if not (float(carry[2]) < t_end_val
                            and steps_now < max_steps):
                        break
                return fin_jit(p, carry)
            if chunks is None:
                if latent is not None:
                    return sample_jit(p, k_batch, ts)
                return sample_jit(p, k_batch, batch, ts)
            _, init_jit, seg_jit, fin_jit = sample_jit
            # init/finalize see a 1-row grid slice: the segment contract
            # restricts their ts use to dtype (samplers/base.py), which
            # keeps these programs NFE-independent (one compile per
            # sampler, shared across the whole NFE sweep)
            ts1 = ts[:1]
            carry = (init_jit(p, k_batch, ts1) if latent is not None
                     else init_jit(p, k_batch, batch, ts1))
            for chunk in chunks:
                carry = seg_jit(p, carry, chunk)
            return fin_jit(p, carry, ts1)

    total_nfe = 0
    n_batches = -(-n_samples // per_step)

    def produce():
        """Dispatch loop: yields (out_dev, batch_np, take, batch_idx,
        prefix); device work for item k+1 starts before item k is
        consumed (utils.pipeline.lagged)."""
        planned = 0
        for batch_idx in range(n_batches):
            take = min(per_step, n_samples - planned)
            planned += take
            k_batch = jax.random.fold_in(key, batch_idx)
            batch = None
            if is_host_loop:
                # SciPy host loop: no recompile concern, keep exact widths
                batch = (latent.sample_batch(k_batch, take) if latent
                         is not None else
                         batch_source(k_batch, take, batch_idx, rank, nproc))
                out = sampler.sample(k_batch, batch, ts, n_eff,
                                     denoise=denoise, eps=eps)
            else:
                p = params if param_source is None else param_source(
                    batch_idx, params)
                if latent is not None:
                    # prior draw traced into the program: one async call
                    out = _dispatch(p, k_batch, None)
                else:
                    # full-width dispatch + host-side slice (serve mechanism)
                    batch = batch_source(k_batch, per_step, batch_idx, rank,
                                         nproc)
                    batch = shard_batch(batch, mesh, sharding=b_sharding)
                    out = _dispatch(p, k_batch, batch)
            prefix = (None if prefix_source is None
                      else prefix_source(batch_idx))
            batch_np = (tuple(np.asarray(b)[:take] for b in batch)
                        if write_extra_batch else None)
            yield out, batch_np, take, batch_idx, prefix

    state = {"written": 0, "nfe": 0}

    def consume(item):
        """Fetch + write one batch; runs on the writer thread so the
        dispatch loop free-runs (timed on the tunneled v5e: a production
        generate run sustains the pure-sampler device rate, 1.87 vs 1.86
        bench img/s -- fetch + PNG encode fully hidden)."""
        out, batch_np, take, b_idx, prefix = item
        if reports_nfe:
            out, nfe = out
            state["nfe"] += int(nfe)  # replicated scalar: host-fetchable
        # lockstep: this process writes ONLY its addressable shard rows
        out_np = _fetch_local(out, take) if lockstep else \
            np.asarray(out)[:take]
        if prefix is not None:
            writer.sample_prefix = prefix
        if write_extra_batch:
            writer.write_batch(out_np, rank=rank, batch_idx=b_idx,
                               batch=batch_np)
        else:
            writer.write_batch(out_np, rank=rank, batch_idx=b_idx)
        state["written"] += len(out_np) if lockstep else take
        if (b_idx + 1) % 10 == 0:
            logger.info("sampled %d / %d", state["written"], n_samples)

    consume_stream(produce(), consume, depth=2)
    written = state["written"]
    total_nfe = state["nfe"]
    if is_host_loop:
        logger.info("bb_ode mean NFE: %.1f", sampler.mean_nfe)
    if reports_nfe and n_batches:
        logger.info("adaptive_ode mean NFE: %.1f", total_nfe / n_batches)
    return written


def sample(config, preloaded=None, jit_cache=None):
    """Unconditional generation (reference eval/sample.py:28-109).

    ``preloaded=(net, params)`` skips the checkpoint restore and
    ``jit_cache`` (caller-owned dict) shares compiled sampler programs --
    used by sweep drivers that sample the same weights under many
    sampler/NFE configurations."""
    sde = build_sde(config)
    net, params = preloaded if preloaded else load_eval_state(config)
    sampler_cls = get_module("samplers", str(config.evaluation.sampler.name))

    def sampler_factory(p):
        score_fn = make_score_fn(net, p, bf16=eval_bf16(config))
        return sampler_cls(config, sde, score_fn,
                           corrector_fn=build_corrector(config, sde,
                                                        score_fn))

    writer = SimpleImageWriter(
        str(config.evaluation.save_path),
        sample_prefix=str(config.evaluation.sample_prefix),
        path_prefix=str(config.evaluation.path_prefix),
        save_mode=str(config.evaluation.save_mode),
        is_norm=bool(config.data.norm),
        is_augmented=bool(config.model.sde.get("is_augmented", True)),
    )
    latent = SDELatentDataset(sde, config)
    return _run_sampler(config, sde, sampler_factory, params, writer,
                        None, jit_cache=jit_cache, latent=latent)


def class_cond_sample(config):
    """Classifier-guided generation
    (reference eval/class_cond_sample.py:28-121). ``config`` carries both
    the ``diffusion`` and ``clf`` trees."""
    dcfg = config.diffusion
    sde = build_sde(dcfg)
    net, params = load_eval_state(dcfg)

    clf_net, clf_params_init = build_clf_model(config.clf)
    clf_opt = make_optimizer(config.clf.training.optimizer)
    clf_abstract = init_state(clf_params_init, clf_opt)
    clf_state = ckpt.restore_checkpoint(
        str(config.clf.evaluation.chkpt_path), clf_abstract)

    merged = _merged_eval_config(config)
    sampler_cls = get_module("samplers", str(dcfg.evaluation.sampler.name))

    # `label_to_sample` may be a single class (reference parity), a comma
    # list, or "all": multiple labels cycle per dispatch batch through ONE
    # compiled program (the label is a traced jit argument, never a
    # constant -- a per-label recompile costs minutes on remote backends)
    labels = _parse_label_spec(config.clf.evaluation.label_to_sample,
                               int(config.clf.model.clf_fn.n_cls))

    def sampler_factory(triple):
        score_p, clf_p, y = triple
        score_fn = make_score_fn(net, score_p, bf16=eval_bf16(merged))
        return sampler_cls(merged, sde, score_fn,
                           clf_fn=make_score_fn(clf_net, clf_p,
                                                bf16=eval_bf16(merged)),
                           y=y,
                           corrector_fn=build_corrector(merged, sde,
                                                        score_fn))

    writer = SimpleImageWriter(
        str(dcfg.evaluation.save_path),
        sample_prefix=str(dcfg.evaluation.sample_prefix),
        path_prefix=str(dcfg.evaluation.path_prefix),
        save_mode=str(dcfg.evaluation.save_mode),
        is_norm=bool(dcfg.data.norm),
        is_augmented=True,
    )
    latent = SDELatentDataset(sde, dcfg)

    param_source = prefix_source = None
    if len(labels) > 1:
        # cycle labels by GLOBAL batch slot (batch_idx * nproc + rank) so a
        # multi-rank fan-out covers all classes instead of every rank
        # repeating the same head of the label list; in lockstep mode
        # nproc=1 so the cycle is the shared global batch index
        rank, nproc, lockstep = _rank_info(dcfg)
        if lockstep:
            rank = 0
        per_step = int(dcfg.evaluation.batch_size) * (
            make_mesh().devices.size
            // int(dcfg.evaluation.get("spatial", 1)))
        per_rank = -(-int(dcfg.evaluation.n_samples) // nproc)
        n_slots = -(-per_rank // per_step) * nproc
        if n_slots < len(labels):
            logger.warning(
                "label cycling is per dispatch batch: n_samples=%s fills "
                "only %d batch slots for %d labels -- classes %s will NOT "
                "be sampled (raise n_samples for full coverage)",
                dcfg.evaluation.n_samples, n_slots, len(labels),
                labels[n_slots:])
        base_prefix = str(dcfg.evaluation.sample_prefix)

        def label_at(i):
            return labels[(i * nproc + rank) % len(labels)]

        def param_source(i, rep):
            return (rep[0], rep[1], jnp.asarray(label_at(i), jnp.int32))

        def prefix_source(i):
            return f"{base_prefix}y{label_at(i)}"

    y0 = jnp.asarray(labels[0], jnp.int32)
    return _run_sampler(dcfg, sde, sampler_factory,
                        (params, clf_state.params, y0), writer, None,
                        param_source=param_source,
                        prefix_source=prefix_source, latent=latent)


def _parse_label_spec(spec, n_cls: int) -> list:
    s = str(spec)
    if s == "all":
        return list(range(n_cls))
    if "," in s:
        labels = [int(x) for x in s.split(",") if x != ""]
    else:
        labels = [int(s)]
    bad = [y for y in labels if not 0 <= y < n_cls]
    if bad:
        # with one_hot selection an out-of-range label would silently mean
        # ZERO guidance (all-zeros row), not an index error -- fail loudly
        raise ValueError(
            f"label_to_sample {bad} out of range for n_cls={n_cls}")
    return labels


def _merged_eval_config(config):
    """The guided sampler reads config.clf.evaluation.* and the diffusion
    evaluation tree (reference samplers/sde.py:70-71)."""
    from psld_tpu.config import ConfigDict

    merged = ConfigDict(config.diffusion.to_dict())
    merged["clf"] = ConfigDict(config.clf.to_dict())
    return merged


def edit(config):
    """SDEdit-style guided editing (TPU-native extension; the reference's
    only guided-synthesis paths are classifier guidance and inpainting):
    forward-diffuses guide images from the configured dataset to
    ``evaluation.sampler.edit_t0`` and reverse-diffuses them back. Uses
    the same fan-out machinery as inpainting (rank-interleaved dataset
    shards, full-width dispatches, pipelined writes)."""
    sde = build_sde(config)
    net, params = load_eval_state(config)
    sampler_cls = get_module("samplers", "edit_em_sde")

    def sampler_factory(p):
        score_fn = make_score_fn(net, p, bf16=eval_bf16(config))
        return sampler_cls(config, sde, score_fn,
                           corrector_fn=build_corrector(config, sde,
                                                        score_fn))

    writer = SimpleImageWriter(
        str(config.evaluation.save_path),
        sample_prefix=str(config.evaluation.sample_prefix),
        path_prefix=str(config.evaluation.path_prefix),
        save_mode=str(config.evaluation.save_mode),
        is_norm=bool(config.data.norm),
        is_augmented=bool(config.model.sde.get("is_augmented", True)),
    )
    dataset = get_dataset(config)

    def batch_source(key, bs, batch_idx, rank, nproc):
        start = batch_idx * bs
        idxs = (np.arange(start, start + bs) * nproc + rank) % len(dataset)
        imgs = dataset.batch(idxs)
        if isinstance(imgs, tuple):  # return_target datasets: drop labels
            imgs = imgs[0]
        return jnp.asarray(imgs)

    return _run_sampler(config, sde, sampler_factory, params, writer,
                        batch_source)


def inpaint(config):
    """MNIST-mask inpainting (reference eval/inpaint.py:29-104)."""
    sde = build_sde(config)
    net, params = load_eval_state(config)
    sampler_cls = get_module("samplers", "ip_em_sde")

    def sampler_factory(p):
        return sampler_cls(config, sde,
                           make_score_fn(net, p, bf16=eval_bf16(config)))

    writer = InpaintingImageWriter(
        str(config.evaluation.save_path),
        sample_prefix=str(config.evaluation.sample_prefix),
        path_prefix=str(config.evaluation.path_prefix),
        save_mode=str(config.evaluation.save_mode),
        is_norm=bool(config.data.norm),
        is_augmented=True,
        save_batch=True,
    )
    base = get_dataset(config)
    dataset = InpaintDataset(config, base)

    def batch_source(key, bs, batch_idx, rank, nproc):
        # rank-interleaved dataset shard, mirroring the reference's
        # DistributedSampler split across predict ranks
        start = batch_idx * bs
        idxs = (np.arange(start, start + bs) * nproc + rank) % len(dataset)
        imgs, masks = dataset.batch(idxs)
        return jnp.asarray(imgs), jnp.asarray(masks)

    return _run_sampler(config, sde, sampler_factory, params, writer,
                        batch_source, write_extra_batch=True)
