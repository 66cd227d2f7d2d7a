"""Multi-controller TRAINING with spatial sharding: two jax.distributed
CPU processes (2 local devices each -> one global (data=2, spatial=2)
mesh) run the production train loop with `training.spatial=2`, each
feeding only its full-height batch rows; the result must match a
single-process 4-device run of the identical configuration (same seed ->
same loader permutation -> same global batches; placement only reorders
float accumulation). Also the first end-to-end proof that the epoch loop,
async checkpointing, and prefetch work under a real multi-controller
runtime."""

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

COMMON = r"""
import os, sys
work = sys.argv[-1]
import psld_tpu
psld_tpu.enable_x64()
psld_tpu.import_modules_into_registry()
from psld_tpu.config import compose
from psld_tpu.train.loop import train_sde

cfg = compose([
    "+dataset=cifar10/cifar10_psld",
    "dataset.diffusion.data.name=synthetic",
    f"dataset.diffusion.data.root={work}",
    "dataset.diffusion.data.image_size=16",
    "dataset.diffusion.data.hflip=True",
    "dataset.diffusion.model.score_fn.nf=8",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=1",
    "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
    "dataset.diffusion.model.score_fn.dropout=0.0",
    "dataset.diffusion.training.batch_size=2",
    "dataset.diffusion.training.epochs=1",
    "dataset.diffusion.training.chkpt_interval=1",
    f"dataset.diffusion.training.results_dir={work}/" + RESULTS,
    "+dataset.diffusion.training.spatial=2",
]).dataset.diffusion
state = train_sde(cfg, max_steps=3)
print("DONE", int(state.step), flush=True)
"""

MP_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
""" + COMMON.replace("RESULTS", '"mp_results"')

SP_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
""" + COMMON.replace("RESULTS", '"sp_results"')


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    return env


def _restore_params(ckpt_dir):
    from psld_tpu.config import compose
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.root=/tmp",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
    ]).dataset.diffusion
    net = build_score_model(cfg)
    state = init_state(init_score_params(net, cfg, 0),
                       make_optimizer(cfg.training.optimizer))
    path = ckpt.latest_checkpoint(ckpt_dir)
    assert path, ckpt_dir
    return ckpt.restore_checkpoint(path, state)


def test_two_process_spatial_training_matches_single_process(tmp_path):
    work = str(tmp_path)
    port = str(_free_port())

    procs = [subprocess.Popen(
        [sys.executable, "-c", MP_WORKER, str(pid), port, work],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "DONE 3" in out, out[-2000:]

    sp = subprocess.run([sys.executable, "-c", SP_WORKER, work],
                        env=_env(), capture_output=True, text=True,
                        timeout=1100)
    assert sp.returncode == 0, sp.stdout[-2000:] + sp.stderr[-2000:]
    assert "DONE 3" in sp.stdout

    s_mp = _restore_params(f"{work}/mp_results/checkpoints")
    s_sp = _restore_params(f"{work}/sp_results/checkpoints")
    assert int(s_mp.step) == int(s_sp.step) == 3
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(s_mp.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_spatial_spanning_processes_is_rejected(tmp_path):
    """spatial=4 with only 2 local devices per process must fail with the
    clear cross-process error (simulated: we only check the guard logic
    through a fake process_count)."""
    from unittest import mock

    import jax

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        f"dataset.diffusion.training.results_dir={tmp_path}/r",
        "+dataset.diffusion.training.spatial=4",
    ]).dataset.diffusion
    with mock.patch.object(jax, "process_count", return_value=4), \
            mock.patch.object(jax, "local_device_count", return_value=2):
        with pytest.raises(NotImplementedError, match="cannot span"):
            train_sde(cfg, max_steps=1)


SAMPLE_WORKER = r"""
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
    "+dataset.diffusion.evaluation.spatial=2",
    f"dataset.diffusion.evaluation.chkpt_path={work}/ckpt",
    f"dataset.diffusion.evaluation.save_path={work}/sp_samples",
]).dataset.diffusion
n = sample(cfg)
print("WROTE", pid, n, flush=True)
"""


def test_lockstep_spatial_sampling_two_processes(tmp_path):
    """Lockstep sampling on a (data=2, spatial=2) mesh across two
    processes: each process's devices hold its rows as HEIGHT halves,
    _fetch_local stitches them, and the fan-out writes exactly n_samples
    distinct full-size images."""
    import jax

    from psld_tpu.config import compose
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    work = str(tmp_path)
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
    state = init_state(init_score_params(net, cfg, 0),
                       make_optimizer(cfg.training.optimizer))
    path = ckpt.save_checkpoint(work, "tmp", state)
    os.rename(path, f"{work}/ckpt")

    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, "-c", SAMPLE_WORKER, str(pid), port, work],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    # per_step = batch_size * data_shards = 2 -> 3 dispatches, each
    # process holds ONE full row per dispatch (as two height halves)
    assert "WROTE 0 3" in outs[0] and "WROTE 1 3" in outs[1], (
        outs[0][-200:], outs[1][-200:])

    from PIL import Image

    pngs = sorted(glob.glob(f"{work}/sp_samples/images/*.png"))
    assert len(pngs) == 6, pngs
    arrs = [np.asarray(Image.open(p)) for p in pngs]
    assert all(a.shape == (16, 16, 3) for a in arrs)
    for i in range(len(arrs)):
        for j in range(i + 1, len(arrs)):
            assert not np.array_equal(arrs[i], arrs[j]), (i, j)
