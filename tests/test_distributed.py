"""Multi-host plumbing and preemption-safe shutdown.

True multi-process runs need a pod; here we verify (a) the per-process
batch-slicing logic is exact — the union of all processes' slices, in
order, reconstructs the single-process global batch — (b) single-process
behavior is unchanged, and (c) SIGTERM mid-training checkpoints and exits
cleanly (resumable).
"""

import glob
import os
import signal
import threading
import time

import numpy as np
import pytest

import psld_tpu

psld_tpu.import_modules_into_registry()

from psld_tpu.data.loader import EpochLoader
from psld_tpu.parallel import distributed
from psld_tpu.train.interrupt import GracefulShutdown


class _ArangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idxs):
        return np.asarray(idxs, np.float32)[:, None, None, None]


def _collect(loader):
    return [np.asarray(b).ravel() for b in loader]


def test_process_slices_tile_the_global_batch():
    n, global_bs, procs = 64, 16, 4
    ref = _collect(EpochLoader(_ArangeDataset(n), global_bs, hflip=False,
                               seed=3))
    shards = [
        _collect(EpochLoader(_ArangeDataset(n), global_bs, hflip=False,
                             seed=3, process_index=p, process_count=procs))
        for p in range(procs)
    ]
    assert len(ref) == len(shards[0]) == n // global_bs
    for b, want in enumerate(ref):
        got = np.concatenate([shards[p][b] for p in range(procs)])
        np.testing.assert_array_equal(got, want)
        assert shards[0][b].size == global_bs // procs


def test_single_process_default_unchanged():
    a = _collect(EpochLoader(_ArangeDataset(32), 8, hflip=False, seed=0))
    b = _collect(EpochLoader(_ArangeDataset(32), 8, hflip=False, seed=0,
                             process_index=0, process_count=1))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_indivisible_batch_rounds_down():
    loader = EpochLoader(_ArangeDataset(64), 10, hflip=False,
                         process_index=1, process_count=4)
    assert loader.batch_size == 8 and loader.local_size == 2
    assert loader.local_offset == 2


def test_local_batch_slice_single_process():
    assert distributed.local_batch_slice(32) == (32, 0)
    assert not distributed.multihost_requested()
    distributed.maybe_initialize()  # no-op without the env flag


def test_multihost_env_flag(monkeypatch):
    monkeypatch.setenv("PSLD_MULTIHOST", "1")
    assert distributed.multihost_requested()
    monkeypatch.setenv("PSLD_MULTIHOST", "0")
    assert not distributed.multihost_requested()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    assert distributed.multihost_requested()


def test_graceful_shutdown_flag_and_restore():
    prev = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)
        # the signal is delivered to the main thread synchronously on kill
        for _ in range(100):
            if stop.requested:
                break
            time.sleep(0.01)
        assert stop.requested
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sigterm_mid_training_checkpoints_and_resumes(tmp_path):
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        f"dataset.diffusion.training.results_dir={results}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=8",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[4]",
        "dataset.diffusion.training.batch_size=2",
        "dataset.diffusion.training.epochs=1000",
        "dataset.diffusion.training.chkpt_interval=1000",
    ]).dataset.diffusion

    # fire SIGTERM only once the GracefulShutdown handler is observably
    # installed -- a fixed delay races against model-build/compile time and,
    # on a loss, the default action kills the whole pytest process
    prev_handler = signal.getsignal(signal.SIGTERM)
    fired = threading.Event()

    def _kill_when_armed():
        deadline = time.time() + 300.0
        while time.time() < deadline and not fired.is_set():
            if signal.getsignal(signal.SIGTERM) is not prev_handler:
                os.kill(os.getpid(), signal.SIGTERM)
                fired.set()
                return
            time.sleep(0.02)

    killer = threading.Thread(target=_kill_when_armed, daemon=True)
    killer.start()
    try:
        train_sde(cfg)
        assert fired.is_set(), "SIGTERM was never delivered"
    finally:
        fired.set()
        killer.join(timeout=5.0)
    ckpts = [c for c in glob.glob(f"{results}/checkpoints/psld-*")
             if not c.endswith(".meta.json")]
    assert len(ckpts) == 1, ckpts

    # and the checkpoint restores
    cfg2 = cfg
    cfg2.training.restore_path = ckpts[0]
    cfg2.training.epochs = 1
    train_sde(cfg2, max_steps=1)
