"""Config shim tests: Hydra-compatible surface (group select, dotted
overrides, +new keys, ??? mandatory markers)."""

import pytest

from psld_tpu.config import (
    ConfigDict,
    MissingMandatoryValue,
    compose,
    validate_no_missing,
)


def test_compose_dataset_group_and_overrides():
    cfg = compose(
        [
            "+dataset=cifar10/cifar10_psld",
            "dataset.diffusion.data.root='/tmp/data'",
            "dataset.diffusion.model.score_fn.ch_mult=[2,2,2]",
            "dataset.diffusion.model.score_fn.num_res_blocks=8",
            "dataset.diffusion.model.sde.nu=4.01",
            "dataset.diffusion.training.batch_size=16",
            "dataset.diffusion.training.fp16=False",
            "+dataset.diffusion.evaluation.sampler.solver=RK45",
        ]
    )
    d = cfg.dataset.diffusion
    assert d.data.root == "/tmp/data"
    assert d.model.score_fn.ch_mult == [2, 2, 2]
    assert d.model.score_fn.num_res_blocks == 8
    assert d.model.sde.nu == 4.01
    assert d.training.batch_size == 16
    assert d.training.fp16 is False
    assert d.evaluation.sampler.solver == "RK45"


def test_missing_mandatory_raises():
    cfg = compose(["+dataset=cifar10/cifar10_psld"])
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.dataset.diffusion.data.root
    missing = validate_no_missing(cfg)
    assert "dataset.diffusion.data.root" in missing


def test_override_unknown_key_rejected():
    with pytest.raises(KeyError):
        compose(["+dataset=cifar10/cifar10_psld", "dataset.diffusion.nope=1"])


def test_configdict_roundtrip():
    cfg = ConfigDict({"a": {"b": 1}, "c": [1, 2]})
    assert cfg.a.b == 1
    cfg.a.b = 2
    assert cfg.to_dict() == {"a": {"b": 2}, "c": [1, 2]}
    assert "c" in cfg and "z" not in cfg
