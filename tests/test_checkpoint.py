"""Checkpoint save/restore unit tests (psld_tpu/train/checkpoint.py)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from psld_tpu.train import checkpoint as ckpt
from psld_tpu.train.state import init_state


def _state(dim):
    params = {"params": {"Dense_0": {"kernel": jnp.ones((dim, dim))}}}
    return init_state(params, optax.adam(1e-3))


def test_roundtrip(tmp_path):
    state = _state(4)
    path = ckpt.save_checkpoint(str(tmp_path), "ck", state)
    back = ckpt.restore_checkpoint(path, _state(4))
    np.testing.assert_array_equal(
        np.asarray(back.params["params"]["Dense_0"]["kernel"]),
        np.ones((4, 4)))
    assert int(back.step) == 0


def test_architecture_mismatch_is_readable(tmp_path):
    path = ckpt.save_checkpoint(str(tmp_path), "ck", _state(4))
    with pytest.raises(ValueError, match="model overrides"):
        ckpt.restore_checkpoint(path, _state(8))


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    for ep in (3, 11, 7):
        ckpt.save_checkpoint(str(tmp_path),
                             f"psld-score_xm-epoch={ep:04d}-loss=0.1",
                             _state(2))
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert "epoch=0011" in latest
    assert ckpt.epoch_from_path(latest) == 11


def test_async_saver_survives_donation(tmp_path):
    """AsyncSaver.save must capture the values BEFORE the caller's next
    donated step invalidates the buffers -- the exact usage pattern of the
    train loop. Two saves with a donating mutation in between restore to
    their respective snapshots."""
    import jax

    state = _state(4)

    donate_and_bump_d = jax.jit(
        lambda tree: jax.tree_util.tree_map(lambda x: x + 1.0, tree),
        donate_argnums=0)

    with ckpt.AsyncSaver() as saver:
        p1 = saver.save(str(tmp_path), "ck1", state)
        # donating jit: the saved state's buffers are deleted NOW
        state2 = donate_and_bump_d(state)
        p2 = saver.save(str(tmp_path), "ck2", state2)
        state3 = donate_and_bump_d(state2)
        del state3
    back1 = ckpt.restore_checkpoint(p1, _state(4))
    back2 = ckpt.restore_checkpoint(p2, _state(4))
    np.testing.assert_array_equal(
        np.asarray(back1.params["params"]["Dense_0"]["kernel"]),
        np.ones((4, 4)))
    np.testing.assert_array_equal(
        np.asarray(back2.params["params"]["Dense_0"]["kernel"]),
        np.full((4, 4), 2.0))


def test_async_saver_close_is_idempotent_and_durable(tmp_path):
    saver = ckpt.AsyncSaver()
    path = saver.save(str(tmp_path), "ck", _state(4))
    saver.wait()
    saver.close()
    back = ckpt.restore_checkpoint(path, _state(4))
    assert int(back.step) == 0


def test_resume_epoch_meta(tmp_path):
    import os

    p = str(tmp_path / "psld-x-epoch=0005-loss=0.1000")
    os.makedirs(p)
    ckpt.write_meta(p, 5, complete=True)
    assert ckpt.resume_epoch(p) == 6          # completed -> next epoch
    ckpt.write_meta(p, 5, complete=False)
    assert ckpt.resume_epoch(p) == 5          # interrupted -> replay
    q = str(tmp_path / "psld-x-epoch=0007-loss=0.2000")
    assert ckpt.resume_epoch(q) == 7          # no meta -> filename fallback


def test_resume_continues_at_next_epoch(tmp_path):
    """Resuming from a completed-epoch checkpoint must NOT replay that
    epoch (the pre-meta behavior re-trained it, duplicating data): 8
    steps/epoch, resume from epoch-1's checkpoint, expect exactly epoch 2
    to run (total step 24) and an epoch=0002 checkpoint."""
    import glob

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    base = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
    ]
    cfg = compose(base + ["dataset.diffusion.training.epochs=2"]
                  ).dataset.diffusion
    state = train_sde(cfg)
    assert int(state.step) == 16
    cks = sorted(glob.glob(f"{results}/checkpoints/psld-*0001*"))
    cks = [c for c in cks if not c.endswith(".meta.json")]
    assert len(cks) == 1

    cfg2 = compose(base + [
        "dataset.diffusion.training.epochs=3",
        f"dataset.diffusion.training.restore_path='{cks[0]}'",
    ]).dataset.diffusion
    state2 = train_sde(cfg2)
    # one MORE epoch only: 16 restored + 8 new steps
    assert int(state2.step) == 24, int(state2.step)
    names = {c.split("epoch=")[1][:4]
             for c in glob.glob(f"{results}/checkpoints/psld-*")
             if not c.endswith(".meta.json")}
    assert "0002" in names


def test_restore_path_latest_and_auto_resume(tmp_path):
    """restore_path=latest resumes the newest checkpoint of the run's own
    results_dir (fresh start when none exists); auto_resume=true does the
    same without touching the recipe's restore_path."""
    import glob

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    base = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
        "dataset.diffusion.training.restore_path=latest",
    ]
    # fresh start (no checkpoints yet), 1 epoch = 8 steps
    cfg = compose(base + ["dataset.diffusion.training.epochs=1"]
                  ).dataset.diffusion
    assert int(train_sde(cfg).step) == 8
    # relaunch the SAME command with more epochs: continues, not restarts
    cfg2 = compose(base + ["dataset.diffusion.training.epochs=2"]
                   ).dataset.diffusion
    assert int(train_sde(cfg2).step) == 16
    # auto_resume flag variant
    cfg3 = compose([o for o in base
                    if not o.startswith(
                        "dataset.diffusion.training.restore_path")] + [
        "dataset.diffusion.training.epochs=3",
        "+dataset.diffusion.training.auto_resume=true",
    ]).dataset.diffusion
    assert int(train_sde(cfg3).step) == 24


def test_max_steps_is_global_budget(tmp_path):
    """max_steps counts RESTORED steps too: resume at step 8 with
    max_steps=12 trains only 4 more steps, checkpointing as interrupted."""
    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    base = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.chkpt_interval=1",
        "dataset.diffusion.training.epochs=10",
        f"dataset.diffusion.training.results_dir={results}",
        "dataset.diffusion.training.restore_path=latest",
    ]
    cfg = compose(base).dataset.diffusion
    assert int(train_sde(cfg, max_steps=8).step) == 8
    cfg2 = compose(base).dataset.diffusion
    assert int(train_sde(cfg2, max_steps=12).step) == 12


def test_latest_checkpoint_skips_orbax_tmp_and_breaks_ties_by_mtime(
        tmp_path):
    """A preemption mid-async-save leaves '<name>.orbax-checkpoint-tmp'
    behind -- latest_checkpoint must never pick it (it would crash every
    auto-resume). Same-epoch twins (interrupted->replay runs) resolve to
    the newer mtime."""
    import os
    import time

    ckpt.save_checkpoint(str(tmp_path), "psld-x-epoch=0003-loss=0.5000",
                         _state(2))
    # abandoned async write with a HIGHER epoch
    os.makedirs(str(
        tmp_path / "psld-x-epoch=0009-loss=0.1000.orbax-checkpoint-tmp"))
    got = ckpt.latest_checkpoint(str(tmp_path))
    assert got and got.endswith("epoch=0003-loss=0.5000")

    # same-epoch twin written later must win
    time.sleep(0.05)
    ckpt.save_checkpoint(str(tmp_path), "psld-x-epoch=0003-loss=0.4000",
                         _state(2))
    got = ckpt.latest_checkpoint(str(tmp_path))
    assert got.endswith("epoch=0003-loss=0.4000")


def test_relaunch_of_finished_run_trains_zero_steps(tmp_path):
    """Relaunching a run whose global max_steps budget is already met must
    not run even one dispatch (nor write another checkpoint)."""
    import glob

    import psld_tpu

    psld_tpu.import_modules_into_registry()
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    base = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.chkpt_interval=1",
        "dataset.diffusion.training.epochs=10",
        f"dataset.diffusion.training.results_dir={results}",
        "dataset.diffusion.training.restore_path=latest",
        "+dataset.diffusion.training.steps_per_dispatch=4",
    ]
    cfg = compose(base).dataset.diffusion
    assert int(train_sde(cfg, max_steps=8).step) == 8
    n_ckpts = len([c for c in glob.glob(f"{results}/checkpoints/psld-*")
                   if not c.endswith(".meta.json")])
    cfg2 = compose(base).dataset.diffusion
    assert int(train_sde(cfg2, max_steps=8).step) == 8  # no extra steps
    n_ckpts2 = len([c for c in glob.glob(f"{results}/checkpoints/psld-*")
                    if not c.endswith(".meta.json")])
    assert n_ckpts2 == n_ckpts  # and no drifting extra checkpoint
