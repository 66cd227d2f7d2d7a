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
