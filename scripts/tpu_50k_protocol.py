"""The reference's 50k-sample quality protocol, end-to-end on one chip.

The reference's quality gate is 50k samples -> torch-fidelity FID vs the
training set (/root/reference/scripts_psld/fid.sh:1, README.md:136; the
published CIFAR-10 numbers are FID 2.10/2.01, README.md:22). Real
Inception weights and the real dataset cannot enter this container
(egress), so the *number* here is dummy — but every moving part of the
protocol is real and is exercised at the real scale:

  phase "sample": 50k samples through the production ``psld_tpu.cli.sample``
      entry point (subprocess, JAX_LOG_COMPILES=1) -> native PNG writer.
      The parent records wall-clock, steady img/s from the child's progress
      lines (timestamped at the parent, so no trust in child clocks), peak
      host RSS (VmHWM), and every XLA compile event with the progress count
      at which it happened — the padded tail batch must cause ZERO
      recompiles after steady state.
  phase "fid": ``psld_tpu.cli.fid`` over the 50k PNG dir vs the data-ref
      dir, random-keyed Inception weights (metric value meaningless,
      50k-feature moment streaming + IO real). RSS + wall-clock recorded.
  phase "pixel_stats": weight-free pixel sanity stats + multi-scale SWD
      over the full 50k set vs the data reference.

Artifacts: one JSON line per phase appended to
``scripts/results_50k_protocol.jsonl`` (+ stdout).

Usage (TPU host):
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/tpu_50k_protocol.py
Env knobs: PSLD_R3_DIR (default /tmp/psld_r3, needs score/checkpoints +
data_ref from scripts/tpu_r3_prepare.py), PSLD_50K_MODEL (demo|flagship —
flagship needs flagship/checkpoints from scripts/tpu_flagship_longrun.py
and defaults to bs64 + evaluation.bf16, the production quality recipe),
PSLD_50K_N (default 50000), PSLD_50K_BS (default 256 demo / 64 flagship),
PSLD_50K_NFE (default 100), PSLD_50K_SAMPLER (default sscs_sde),
PSLD_50K_BF16 (1/0), PSLD_50K_CKPT (explicit checkpoint path),
PSLD_50K_OUT (default $PSLD_R3_DIR/protocol50k[_flagship]).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import threading
import time

R3 = os.environ.get("PSLD_R3_DIR", "/tmp/psld_r3")
# demo: the nf=64 recipe scripts/tpu_r3_prepare.py trains (round-3 run);
# flagship: the 97.6M SOTA recipe scripts/tpu_flagship_longrun.py trains
# — the round-4 verdict requires the protocol proven on the FLAGSHIP
# pipeline (bf16 SSCS-100 at bs64), not just the demo's.
MODEL = os.environ.get("PSLD_50K_MODEL", "demo")
OUT = os.environ.get("PSLD_50K_OUT",
                     os.path.join(R3, f"protocol50k_{MODEL}"
                                  if MODEL != "demo" else "protocol50k"))
N = int(os.environ.get("PSLD_50K_N", 50000))
BS = int(os.environ.get("PSLD_50K_BS", 256 if MODEL == "demo" else 64))
NFE = int(os.environ.get("PSLD_50K_NFE", 100))
SAMPLER = os.environ.get("PSLD_50K_SAMPLER", "sscs_sde")
BF16 = os.environ.get("PSLD_50K_BF16",
                      "0" if MODEL == "demo" else "1") == "1"
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_50k_protocol.jsonl")

MODEL_OVERRIDES = {
    "demo": [
        "dataset.diffusion.model.score_fn.nf=64",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=2",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
    ],
    "flagship": [
        "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=8",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.model.score_fn.dropout=0.15",
        "dataset.diffusion.model.score_fn.progressive_input='residual'",
        "dataset.diffusion.model.score_fn.fir=True",
        "dataset.diffusion.model.score_fn.embedding_type='fourier'",
    ],
}[MODEL]
CKPT_DIR = {"demo": "score", "flagship": "flagship"}[MODEL]


def emit(rec: dict):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def latest_ckpt(results: str) -> str:
    ckpts = sorted(c for c in glob.glob(f"{results}/checkpoints/*epoch=*")
                   if not c.endswith(".meta.json"))
    assert ckpts, f"no checkpoint under {results}"
    return ckpts[-1]


class RSSMonitor(threading.Thread):
    """Polls VmHWM of a child pid (peak RSS is monotone, so 2s polling
    cannot miss the max as long as we read once after exit)."""

    def __init__(self, pid: int):
        super().__init__(daemon=True)
        self.pid, self.peak_kb, self._stop = pid, 0, threading.Event()

    def _read(self):
        try:
            with open(f"/proc/{self.pid}/status") as f:
                for ln in f:
                    if ln.startswith("VmHWM:"):
                        self.peak_kb = max(self.peak_kb,
                                           int(ln.split()[1]))
        except OSError:
            pass

    def run(self):
        while not self._stop.wait(2.0):
            self._read()

    def stop(self):
        self._read()
        self._stop.set()


def run_monitored(cmd: list[str], extra_env: dict, progress_re: str | None):
    """Run cmd; return (elapsed_s, peak_rss_mb, events) where events are
    (t_rel, kind, payload) for compile lines and progress lines, stamped
    with the PARENT clock as they arrive on the child's stderr."""
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    env["JAX_LOG_COMPILES"] = "1"
    env["PYTHONUNBUFFERED"] = "1"
    env.update(extra_env)
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    mon = RSSMonitor(proc.pid)
    mon.start()
    events, tail = [], []
    prog = re.compile(progress_re) if progress_re else None
    for line in proc.stdout:
        t = time.time() - t0
        tail.append(line)
        tail = tail[-40:]
        if "Finished XLA compilation" in line:
            events.append((round(t, 2), "compile", line.strip()[:160]))
        elif prog is not None:
            m = prog.search(line)
            if m:
                events.append((round(t, 2), "progress", int(m.group(1))))
    code = proc.wait()
    mon.stop()
    if code != 0:
        sys.stderr.write("".join(tail))
        raise RuntimeError(f"{cmd[:3]}... exited {code}")
    return time.time() - t0, mon.peak_kb / 1024.0, events


def phase_sample(ckpt: str) -> str:
    cmd = [sys.executable, "-m", "psld_tpu.cli.sample",
           "+dataset=cifar10/cifar10_psld",
           *MODEL_OVERRIDES,
           "dataset.diffusion.data.name=synthetic",
           f"dataset.diffusion.data.root={R3}",
           f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
           "dataset.diffusion.evaluation.sample_from=target",
           f"dataset.diffusion.evaluation.save_path={OUT}/samples",
           "dataset.diffusion.evaluation.sample_prefix=tpu",
           f"dataset.diffusion.evaluation.batch_size={BS}",
           f"dataset.diffusion.evaluation.n_samples={N}",
           f"dataset.diffusion.evaluation.n_discrete_steps={NFE}",
           f"dataset.diffusion.evaluation.sampler.name={SAMPLER}",
           f"dataset.diffusion.evaluation.path_prefix={NFE}"]
    if BF16:
        cmd.append("+dataset.diffusion.evaluation.bf16=true")
    elapsed, rss_mb, events = run_monitored(
        cmd, {}, progress_re=r"sampled (\d+) /")
    img_dir = f"{OUT}/samples/{NFE}/images"
    n_png = len(glob.glob(os.path.join(img_dir, "*.png")))
    compiles = [e for e in events if e[1] == "compile"]
    progress = [e for e in events if e[1] == "progress"]
    # steady img/s: slope over the second half of the progress stream
    # (past compile + first-dispatch warmup)
    steady = None
    if len(progress) >= 4:
        half = progress[len(progress) // 2:]
        dt = half[-1][0] - half[0][0]
        dn = half[-1][2] - half[0][2]
        steady = round(dn / dt, 3) if dt > 0 else None
    # any compile event after the FIRST progress line is a mid-run
    # recompile (the padded tail must not trigger one)
    t_first_prog = progress[0][0] if progress else None
    late = [c for c in compiles
            if t_first_prog is not None and c[0] > t_first_prog]
    emit({"phase": "sample", "model": MODEL, "bf16": BF16,
          "sampler": SAMPLER, "nfe": NFE, "batch": BS,
          "n_samples": N, "n_png_written": n_png,
          "elapsed_s": round(elapsed, 1),
          "overall_img_per_s": round(N / elapsed, 3),
          "steady_img_per_s": steady,
          "peak_host_rss_mb": round(rss_mb, 1),
          "n_compiles": len(compiles),
          "recompiles_after_steady": len(late),
          "late_compiles": [c[2] for c in late][:5],
          "checkpoint": ckpt})
    assert n_png == N, f"writer wrote {n_png} != {N}"
    return img_dir


def phase_fid(img_dir: str):
    cmd = [sys.executable, "-m", "psld_tpu.cli.fid",
           "--input1", img_dir, "--input2", os.path.join(R3, "data_ref"),
           "--batch", "128",
           "--save-stats1", os.path.join(OUT, "stats_50k.npz")]
    elapsed, rss_mb, _ = run_monitored(cmd, {}, progress_re=None)
    emit({"phase": "fid_stream", "model": MODEL, "n_images": N,
          "weights": "random-keyed (dummy value; moments pipeline real)",
          "elapsed_s": round(elapsed, 1),
          "img_per_s": round(N / elapsed, 2),
          "peak_host_rss_mb": round(rss_mb, 1),
          "stats_npz": os.path.join(OUT, "stats_50k.npz")})


def phase_pixel_stats(img_dir: str):
    cmd = [sys.executable, "-m", "psld_tpu.cli.pixel_stats",
           "--input1", img_dir, "--input2", os.path.join(R3, "data_ref"),
           "--swd"]
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    env["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
    t0 = time.time()
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("pixel_stats failed")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    emit({"phase": "pixel_stats", "model": MODEL,
          "elapsed_s": round(time.time() - t0, 1),
          **rec})


def main():
    os.makedirs(OUT, exist_ok=True)
    ckpt = (os.environ.get("PSLD_50K_CKPT")
            or latest_ckpt(os.path.join(R3, CKPT_DIR)))
    t0 = time.time()
    img_dir = phase_sample(ckpt)
    phase_fid(img_dir)
    phase_pixel_stats(img_dir)
    emit({"phase": "protocol_done", "total_wall_s": round(time.time() - t0, 1),
          "out": OUT})


if __name__ == "__main__":
    main()
