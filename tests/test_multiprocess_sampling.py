"""Lockstep SPMD sampling under a REAL multi-controller jax runtime.

Spawns two jax.distributed CPU processes (2 local devices each -> one
global 4-device mesh), both running the production `sample()` path against
a shared checkpoint. Each process must execute the identical global
program, write only its addressable shard rows (process-tagged files), and
together produce exactly n_samples distinct images.
"""

import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import psld_tpu

psld_tpu.import_modules_into_registry()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
import psld_tpu
psld_tpu.enable_x64()
psld_tpu.import_modules_into_registry()
from psld_tpu.config import compose
from psld_tpu.eval.generate import sample

cfg = compose([
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={work}",
    "dataset.diffusion.data.image_size=16",
    "dataset.diffusion.model.score_fn.nf=8",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=1",
    "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
    "dataset.diffusion.evaluation.n_discrete_steps=4",
    "dataset.diffusion.evaluation.n_samples=6",
    "dataset.diffusion.evaluation.batch_size=1",
    f"dataset.diffusion.evaluation.chkpt_path={work}/ckpt",
    f"dataset.diffusion.evaluation.save_path={work}/mp_samples",
]).dataset.diffusion
n = sample(cfg)
print("WROTE", pid, n, flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def shared_ckpt(tmp_path_factory):
    """A tiny random-init checkpoint both workers restore."""
    work = tmp_path_factory.mktemp("mp")
    import jax

    from psld_tpu.config import compose
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={work}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
    ]).dataset.diffusion
    net = build_score_model(cfg)
    params = init_score_params(net, cfg, 0)
    state = init_state(params, make_optimizer(cfg.training.optimizer))
    path = ckpt.save_checkpoint(str(work), "tmp", state)
    os.rename(path, str(work / "ckpt"))
    del jax
    return work


def test_lockstep_two_process_sampling(shared_ckpt):
    work = shared_ckpt
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO  # drop any sitecustomize platform override
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), port, str(work)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # 6 global samples over a 4-wide mesh: batch 0 full (2 rows/process),
    # batch 1 tail take=2 -> process 0 writes 2, process 1 writes 0
    pngs = sorted(glob.glob(f"{work}/mp_samples/images/*.png"))
    assert len(pngs) == 6, pngs
    assert "WROTE 0 4" in outs[0] and "WROTE 1 2" in outs[1], (
        outs[0][-200:], outs[1][-200:])

    # all six images distinct (position-based diversity, shared key)
    from PIL import Image

    arrs = [np.asarray(Image.open(p)) for p in pngs]
    for i in range(len(arrs)):
        for j in range(i + 1, len(arrs)):
            assert not np.array_equal(arrs[i], arrs[j]), (i, j)
