"""Compile-once sampler serving.

The reference has no serving story: every sampling job pays model load +
(in our case) XLA compilation. For production use the compiled sampler
should be reused across requests. ``SamplerService`` loads a checkpoint,
jits ONE sampler program at a fixed per-dispatch batch size, and answers
arbitrary-size sample requests by looping full dispatches (partial final
chunks are sliced host-side — no shape-polymorphic recompiles, ever).

``serve_unix`` exposes the service over a Unix domain socket with a
line-delimited JSON protocol:

    {"cmd": "ping"}                                   -> {"ok": true, "pong": ...}
    {"cmd": "info"}                                   -> {"ok": true, ...model/sampler info}
    {"cmd": "sample", "n": 64, "seed": 1, "out": DIR} -> {"ok": true, "written": 64, ...}
    {"cmd": "shutdown"}                               -> {"ok": true}

Use :func:`psld_tpu.serve.client.request` or any socket client.
"""

from __future__ import annotations

import json
import logging
import os
import socket
import time

import numpy as np

logger = logging.getLogger(__name__)


class SamplerService:
    """Checkpoint -> one compiled sampler program, reused per request."""

    def __init__(self, config):
        import jax

        from psld_tpu.data.datasets import SDELatentDataset
        from psld_tpu.eval.generate import load_eval_state, make_score_fn
        from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from psld_tpu.registry import get_module
        from psld_tpu.samplers.base import make_timesteps
        from psld_tpu.train.loop import build_sde

        self.config = config
        ecfg = config.evaluation
        sampler_cls = get_module("samplers", str(ecfg.sampler.name))
        if getattr(sampler_cls, "host_loop", False) or \
                str(ecfg.sampler.name) == "bb_ode":
            # fail fast -- before loading a 100M-param checkpoint
            raise ValueError(
                "serving requires an on-device sampler (em_sde, sscs_sde, sscs2m_sde, "
                "rk_ode, adaptive_ode, ei_ode); bb_ode runs a SciPy "
                "host loop")
        # validate the spatial layout BEFORE loading a 100M-param
        # checkpoint (same fail-fast rule as the sampler-name check)
        sp = int(ecfg.get("spatial", 1))
        if sp > 1:
            import jax as _jax

            from psld_tpu.parallel.spatial import (check_divisible,
                                                   make_spatial_mesh)

            if _jax.process_count() > 1:
                raise NotImplementedError(
                    "evaluation.spatial under a multi-controller runtime "
                    "is not supported in serving: spatial groups must stay "
                    "within one process (same restriction as generate)")
            mesh_probe = make_spatial_mesh(sp)
            check_divisible(int(config.data.image_size), mesh_probe)
        self.sde = build_sde(config)
        net, params = load_eval_state(config)

        self.denoise = bool(ecfg.denoise)
        n_steps = int(ecfg.n_discrete_steps)
        n_eff = n_steps - 1 if self.denoise else n_steps
        ts = make_timesteps(n_eff, float(ecfg.eval_eps), self.sde.T,
                            str(ecfg.stride_type))
        # evaluation.spatial=S: height-sharded serving (one high-res sample
        # spans S devices; parallel/spatial.py -- same flag as generate;
        # layout validated above, before the checkpoint load)
        if sp > 1:
            from psld_tpu.parallel.spatial import (make_spatial_mesh,
                                                   spatial_batch_sharding)

            self.mesh = make_spatial_mesh(sp)
            b_sharding = spatial_batch_sharding(self.mesh)
        else:
            self.mesh = make_mesh()
            b_sharding = None
        self.batch = int(ecfg.batch_size)
        self.per_step = self.batch * int(self.mesh.shape["data"])
        self.params = replicate(params, self.mesh)
        self._shard = lambda b: shard_batch(b, self.mesh,
                                            sharding=b_sharding)
        self.latent = SDELatentDataset(self.sde, config)
        eps = float(ecfg.eval_eps)

        def _make(params):
            from psld_tpu.samplers.correctors import build_corrector
            from psld_tpu.eval.generate import eval_bf16

            score_fn = make_score_fn(net, params, bf16=eval_bf16(config))
            return sampler_cls(config, self.sde, score_fn,
                               corrector_fn=build_corrector(
                                   config, self.sde, score_fn))

        def _run(params, k, z):
            return _make(params).sample(k, z, ts, n_eff,
                                        denoise=self.denoise, eps=eps)

        # evaluation.nfe_per_dispatch=K: serve the SAME trajectory as K-row
        # chained dispatches (bit-identical; eval/generate.py has the same
        # knob) so big-NFE serving never exceeds a runtime's per-dispatch
        # watchdog. Every fixed-grid sampler segments (SDE family, rk_ode,
        # ei_ode); bb_ode/adaptive_ode ignore it.
        from psld_tpu.samplers.base import supports_segments

        nfe_pd = int(ecfg.get("nfe_per_dispatch", 0) or 0)
        if nfe_pd > 0 and not supports_segments(_make(params)):
            # same situation warns in eval/generate.py:244 — an operator
            # relying on the knob to stay under a dispatch watchdog must
            # hear that the monolithic program is what will run
            logger.warning(
                "evaluation.nfe_per_dispatch=%d ignored: sampler %s has "
                "no segmented scan (fixed-grid samplers only; bb_ode and "
                "adaptive_ode cannot be row-segmented)", nfe_pd,
                str(ecfg.sampler.name))
        if nfe_pd > 0 and supports_segments(_make(params)):
            from psld_tpu.samplers.base import slice_segments

            chunks = slice_segments(
                _make(params).segment_xs(ts, self.denoise, eps), nfe_pd)
            init_jit = jax.jit(lambda p, k, z: _make(p).segment_init(
                k, z, ts, self.denoise, eps))
            seg_jit = jax.jit(lambda p, c, ch: jax.lax.scan(
                _make(p).segment_body, c, ch)[0])
            fin_jit = jax.jit(lambda p, c: _make(p).segment_finalize(
                c, ts, self.denoise, eps))

            def _segmented(params, k, z):
                carry = init_jit(params, k, z)
                for ch in chunks:
                    carry = seg_jit(params, carry, ch)
                return fin_jit(params, carry)

            self._sample = _segmented
        else:
            self._sample = jax.jit(_run)
        self._jax = jax
        self.n_steps = n_steps
        self.compiled = False
        # monotonically increasing request id, used as the writer `rank` so
        # repeated requests into the same out dir never overwrite each other
        self._request_id = 0

    def warmup(self) -> float:
        """Trigger compilation; returns the compile+run wall seconds."""
        t0 = time.time()
        np.asarray(self._request_batch(0, 0))
        self.compiled = True
        return time.time() - t0

    def _request_batch(self, seed: int, batch_idx: int):
        jax = self._jax
        key = jax.random.fold_in(jax.random.PRNGKey(int(seed)), batch_idx)
        z = self.latent.sample_batch(key, self.per_step)
        return self._sample(self.params, key, self._shard(z))

    def sample_to_dir(self, n: int, seed: int, out_dir: str) -> dict:
        """Generate n samples into out_dir (PNG, reference writer layout)."""
        from psld_tpu.eval.writers import SimpleImageWriter

        ecfg = self.config.evaluation
        writer = SimpleImageWriter(
            out_dir,
            sample_prefix=str(ecfg.sample_prefix),
            path_prefix=str(ecfg.path_prefix),
            save_mode=str(ecfg.save_mode),
            is_norm=bool(self.config.data.norm),
            is_augmented=bool(self.config.model.sde.get("is_augmented", True)),
        )
        from psld_tpu.utils.pipeline import consume_stream

        rid = self._request_id
        self._request_id += 1
        t0 = time.time()

        def produce():
            done = 0
            batch_idx = 0
            while done < n:
                take = min(self.per_step, n - done)
                yield self._request_batch(seed, batch_idx), take, batch_idx
                done += take
                batch_idx += 1

        state = {"written": 0, "batches": 0}

        def consume(item):
            # fetch + PNG-encode on the writer thread; dispatches free-run
            out, take, b_idx = item
            writer.write_batch(np.asarray(out)[:take], rank=rid,
                               batch_idx=b_idx)
            state["written"] += take
            state["batches"] = b_idx + 1

        consume_stream(produce(), consume, depth=2)
        written = state["written"]
        batch_idx = state["batches"]
        elapsed = time.time() - t0
        return {"written": written, "batches": batch_idx,
                "request_id": rid,
                "elapsed_s": round(elapsed, 3),
                "img_per_s": round(written / elapsed, 3) if elapsed else None,
                "out": os.path.abspath(out_dir)}

    def info(self) -> dict:
        ecfg = self.config.evaluation
        return {"sampler": str(ecfg.sampler.name),
                "n_discrete_steps": self.n_steps,
                "denoise": self.denoise,
                "per_dispatch_batch": self.per_step,
                "devices": int(self.mesh.devices.size),
                "chkpt_path": str(ecfg.chkpt_path),
                "compiled": self.compiled}


def _handle(svc: SamplerService, req: dict) -> tuple[dict, bool]:
    cmd = req.get("cmd", "sample")
    if cmd == "ping":
        return {"ok": True, "pong": time.time()}, False
    if cmd == "info":
        return {"ok": True, **svc.info()}, False
    if cmd == "shutdown":
        return {"ok": True}, True
    if cmd == "sample":
        n = int(req.get("n", svc.per_step))
        seed = int(req.get("seed", 0))
        out = req.get("out")
        if not out:
            return {"ok": False, "error": "sample requires `out` dir"}, False
        return {"ok": True, **svc.sample_to_dir(n, seed, out)}, False
    return {"ok": False, "error": f"unknown cmd `{cmd}`"}, False


def serve_unix(config, socket_path: str, max_requests: int | None = None,
               ready_callback=None) -> int:
    """Run the sampler service on a Unix socket. Blocks until a shutdown
    request (or max_requests served, for tests). Returns requests served."""
    svc = SamplerService(config)
    logger.info("compiling sampler (%s, %d steps)...",
                svc.info()["sampler"], svc.n_steps)
    secs = svc.warmup()
    logger.info("compiled in %.1fs; serving on %s", secs, socket_path)

    if os.path.exists(socket_path):
        os.unlink(socket_path)
    served = 0
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as srv:
        srv.bind(socket_path)
        srv.listen(8)
        if ready_callback is not None:
            ready_callback(svc)
        stop = False
        while not stop and (max_requests is None or served < max_requests):
            conn, _ = srv.accept()
            with conn:
                # bound the read so a silent client cannot wedge the
                # single-threaded accept loop
                conn.settimeout(30.0)
                buf = b""
                try:
                    while not buf.endswith(b"\n"):
                        chunk = conn.recv(65536)
                        if not chunk:
                            break
                        buf += chunk
                except TimeoutError:
                    logger.warning("client recv timed out; dropping")
                    continue
                if not buf.strip():
                    continue
                try:
                    reply, stop = _handle(svc, json.loads(buf.decode()))
                except Exception as e:  # keep serving on bad requests
                    logger.exception("request failed")
                    reply, stop = {"ok": False, "error": repr(e)}, False
                try:
                    conn.sendall((json.dumps(reply) + "\n").encode())
                except OSError:
                    # client gave up (e.g. short timeout on a big job) --
                    # the server and its compiled program must survive
                    logger.warning("client disconnected before reply")
                served += 1
    os.unlink(socket_path)
    return served
