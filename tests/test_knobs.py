"""Config-keyed perf knobs (psld_tpu/knobs.py): resolution precedence and
the metadata round-trip — resolved knob values must land in the metrics
stream header and in every checkpoint sidecar (round-3 verdict item 6)."""

import glob
import json

import pytest

import psld_tpu
from psld_tpu import knobs
from psld_tpu.config import ConfigDict, compose

psld_tpu.import_modules_into_registry()


@pytest.fixture(autouse=True)
def _clean_knobs(monkeypatch):
    for var in ("PSLD_FUSED_GN", "PSLD_PAD_ATTN", "PSLD_DROPOUT_PALLAS",
                "PSLD_DROPOUT_REMAT"):
        monkeypatch.delenv(var, raising=False)
    saved = dict(knobs._state)
    yield
    knobs._state.update(saved)


def _cfg_with(**sf):
    return ConfigDict({"model": {"score_fn": dict(sf)}})


def test_config_sets_ops_knobs():
    knobs.configure(_cfg_with(fused_gn=True, pad_attn=False))
    assert knobs.fused_gn() is True
    assert knobs.pad_attn() is False
    knobs.configure(_cfg_with(fused_gn=False))
    assert knobs.fused_gn() is False


def test_env_overrides_config(monkeypatch):
    knobs.configure(_cfg_with(fused_gn=True, pad_attn=False))
    monkeypatch.setenv("PSLD_FUSED_GN", "0")
    monkeypatch.setenv("PSLD_PAD_ATTN", "1")
    assert knobs.fused_gn() is False
    assert knobs.pad_attn() is True
    r = knobs.resolved(_cfg_with(dropout_impl="hw"))
    assert r == {"fused_gn": False, "pad_attn": True, "dropout_impl": "hw"}


def test_resolved_reports_dropout_env_override(monkeypatch):
    monkeypatch.setenv("PSLD_DROPOUT_PALLAS", "1")
    r = knobs.resolved(_cfg_with(dropout_impl="save_mask"))
    assert r["dropout_impl"] == "hw"


def test_metadata_roundtrip(tmp_path):
    """A real (tiny) training run with config-keyed knobs: the resolved
    values must be recoverable from the run's artifacts alone."""
    from psld_tpu.train.loop import train_sde

    results = str(tmp_path / "results")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "+dataset.diffusion.model.score_fn.dropout_impl=hw",
        "+dataset.diffusion.model.score_fn.fused_gn=false",
        "dataset.diffusion.training.batch_size=8",
        "dataset.diffusion.training.chkpt_interval=1",
        "dataset.diffusion.training.epochs=1",
        f"dataset.diffusion.training.results_dir={results}",
    ]).dataset.diffusion
    train_sde(cfg)

    with open(f"{results}/metrics.jsonl") as f:
        head = json.loads(f.readline())
    assert head.get("header") is True
    assert head["knobs"]["dropout_impl"] == "hw"
    assert head["knobs"]["fused_gn"] is False
    assert head["knobs"]["pad_attn"] is False
    assert head["knobs"]["bf16"] is False

    metas = glob.glob(f"{results}/checkpoints/*.meta.json")
    assert metas
    with open(metas[0]) as f:
        meta = json.load(f)
    assert meta["knobs"]["dropout_impl"] == "hw"
    assert "epoch" in meta and "complete" in meta


def test_tpu_knob_hint(caplog):
    """On an accelerator backend, a dropout>0 run on the stock save_mask
    path must log the one-line hw_inline hint (round-4 verdict weak #5);
    hw_inline runs and CPU runs must stay silent."""
    import logging

    import jax

    from psld_tpu.config import ConfigDict
    from psld_tpu.train.loop import _hint_tpu_knobs

    cfg = ConfigDict({"model": {"score_fn": {"dropout": 0.15}}})

    class _Dev:
        platform = "tpu"

    real_devices = jax.devices
    jax.devices = lambda: [_Dev()]
    try:
        with caplog.at_level(logging.INFO, logger="psld_tpu.train.loop"):
            _hint_tpu_knobs(cfg, {"dropout_impl": "save_mask"})
        assert any("hw_inline" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.INFO, logger="psld_tpu.train.loop"):
            _hint_tpu_knobs(cfg, {"dropout_impl": "hw_inline"})
        assert not caplog.records
    finally:
        jax.devices = real_devices

    # cpu platform (the real one here): silent even on save_mask
    with caplog.at_level(logging.INFO, logger="psld_tpu.train.loop"):
        _hint_tpu_knobs(cfg, {"dropout_impl": "save_mask"})
    assert not caplog.records
