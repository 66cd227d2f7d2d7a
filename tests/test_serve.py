"""Compile-once sampler serving (psld_tpu/serve/)."""

import glob
import os
import threading

import pytest

import psld_tpu

psld_tpu.import_modules_into_registry()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A live server on a tiny model with a fresh (untrained) checkpoint."""
    import jax

    from psld_tpu.config import compose
    from psld_tpu.serve.server import serve_unix
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    root = tmp_path_factory.mktemp("serve")
    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={root}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.evaluation.batch_size=2",
        "dataset.diffusion.evaluation.n_discrete_steps=4",
        "dataset.diffusion.evaluation.sample_from=target",
        f"dataset.diffusion.evaluation.chkpt_path={root}/ckpt",
    ]).dataset.diffusion

    net = build_score_model(cfg)
    params = init_score_params(net, cfg, 0)
    state = init_state(params, make_optimizer(cfg.training.optimizer))
    ckpt.save_checkpoint(str(root), "ckpt", state)

    sock = str(root / "psld.sock")
    ready = threading.Event()
    out: dict = {}

    def run():
        out["served"] = serve_unix(cfg, sock, max_requests=16,
                                   ready_callback=lambda svc: ready.set())

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert ready.wait(timeout=300), "server did not come up"
    yield sock, root, out
    if th.is_alive():
        from psld_tpu.serve import request

        try:
            request(sock, {"cmd": "shutdown"}, timeout=60)
        except OSError:
            pass
    th.join(timeout=60)


def test_ping_and_info(served):
    from psld_tpu.serve import request

    sock, _, _ = served
    assert request(sock, {"cmd": "ping"})["ok"]
    info = request(sock, {"cmd": "info"})
    assert info["ok"] and info["compiled"]
    assert info["sampler"] == "em_sde"
    # per-dispatch = batch_size * n_devices (8-device CPU mesh in conftest)
    assert info["per_dispatch_batch"] == 2 * info["devices"]


def test_sample_request_writes_pngs(served):
    from psld_tpu.serve import request

    sock, root, _ = served
    out_dir = str(root / "req1")
    r = request(sock, {"cmd": "sample", "n": 3, "seed": 7, "out": out_dir})
    assert r["ok"] and r["written"] == 3
    pngs = glob.glob(os.path.join(out_dir, "**", "*.png"), recursive=True)
    assert len(pngs) == 3


def test_sample_larger_than_dispatch_loops(served):
    from psld_tpu.serve import request

    sock, root, _ = served
    out_dir = str(root / "req2")
    n = 2 * 8 + 5  # 1 full dispatch + partial
    r = request(sock, {"cmd": "sample", "n": n, "seed": 8, "out": out_dir})
    assert r["ok"] and r["written"] == n and r["batches"] == 2
    pngs = glob.glob(os.path.join(out_dir, "**", "*.png"), recursive=True)
    assert len(pngs) == n


def test_seed_determinism(served):
    import numpy as np
    from PIL import Image

    from psld_tpu.serve import request

    sock, root, _ = served
    d1, d2, d3 = (str(root / f"det{i}") for i in range(3))
    request(sock, {"cmd": "sample", "n": 2, "seed": 5, "out": d1})
    request(sock, {"cmd": "sample", "n": 2, "seed": 5, "out": d2})
    request(sock, {"cmd": "sample", "n": 2, "seed": 6, "out": d3})

    def load(d):
        return [np.asarray(Image.open(f)) for f in sorted(
            glob.glob(os.path.join(d, "**", "*.png"), recursive=True))]

    a, b, c = load(d1), load(d2), load(d3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any((x != y).any() for x, y in zip(a, c))


def test_bad_request_keeps_serving(served):
    from psld_tpu.serve import request

    sock, _, _ = served
    r = request(sock, {"cmd": "sample"})  # missing out dir
    assert not r["ok"] and "out" in r["error"]
    r = request(sock, {"cmd": "nope"})
    assert not r["ok"]
    assert request(sock, {"cmd": "ping"})["ok"]  # still alive


def test_repeat_requests_same_dir_accumulate(served):
    """Two requests into one out dir must not overwrite each other (the
    writer rank is the per-request id)."""
    from psld_tpu.serve import request

    sock, root, _ = served
    out_dir = str(root / "accum")
    r1 = request(sock, {"cmd": "sample", "n": 2, "seed": 1, "out": out_dir})
    r2 = request(sock, {"cmd": "sample", "n": 2, "seed": 2, "out": out_dir})
    assert r1["ok"] and r2["ok"]
    assert r1["request_id"] != r2["request_id"]
    pngs = glob.glob(os.path.join(out_dir, "**", "*.png"), recursive=True)
    assert len(pngs) == 4


def test_shutdown(served):
    from psld_tpu.serve import request

    sock, _, out = served
    assert request(sock, {"cmd": "shutdown"})["ok"]
    # server loop exited; socket removed
    import time

    for _ in range(50):
        if not os.path.exists(sock):
            break
        time.sleep(0.1)
    assert not os.path.exists(sock)


def test_serve_rk_ode_sampler(tmp_path):
    """The service works with any on-device sampler, not just EM."""
    import jax  # noqa: F401

    from psld_tpu.config import compose
    from psld_tpu.serve.server import SamplerService
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.evaluation.batch_size=1",
        "dataset.diffusion.evaluation.n_discrete_steps=4",
        "dataset.diffusion.evaluation.sampler.name=rk_ode",
        "+dataset.diffusion.evaluation.sampler.solver=heun",
        "dataset.diffusion.evaluation.sample_from=target",
        f"dataset.diffusion.evaluation.chkpt_path={tmp_path}/ckpt",
    ]).dataset.diffusion

    net = build_score_model(cfg)
    state = init_state(init_score_params(net, cfg, 0),
                       make_optimizer(cfg.training.optimizer))
    ckpt.save_checkpoint(str(tmp_path), "ckpt", state)

    svc = SamplerService(cfg)
    svc.warmup()
    r = svc.sample_to_dir(2, seed=3, out_dir=str(tmp_path / "out"))
    assert r["written"] == 2
    pngs = glob.glob(str(tmp_path / "out" / "**" / "*.png"), recursive=True)
    assert len(pngs) == 2


def test_serve_rejects_host_loop_sampler(tmp_path):
    from psld_tpu.config import compose
    from psld_tpu.serve.server import SamplerService

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.evaluation.sampler.name=bb_ode",
        f"dataset.diffusion.evaluation.chkpt_path={tmp_path}/none",
    ]).dataset.diffusion
    with pytest.raises(ValueError, match="on-device sampler"):
        SamplerService(cfg)


def test_serve_spatial_sharded(tmp_path):
    """evaluation.spatial=4 serves from a (data=2, spatial=4) mesh: the
    dispatch width multiplies over `data` only and requests still write
    the right number of PNGs."""
    from psld_tpu.config import compose
    from psld_tpu.serve.server import SamplerService
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.evaluation.batch_size=1",
        "dataset.diffusion.evaluation.n_discrete_steps=4",
        "dataset.diffusion.evaluation.sample_from=target",
        "+dataset.diffusion.evaluation.spatial=4",
        f"dataset.diffusion.evaluation.chkpt_path={tmp_path}/ckpt",
    ]).dataset.diffusion

    net = build_score_model(cfg)
    state = init_state(init_score_params(net, cfg, 0),
                       make_optimizer(cfg.training.optimizer))
    ckpt.save_checkpoint(str(tmp_path), "ckpt", state)

    svc = SamplerService(cfg)
    assert dict(svc.mesh.shape) == {"data": 2, "spatial": 4}
    assert svc.per_step == 2  # batch_size * data shards, NOT * 8 devices
    svc.warmup()
    r = svc.sample_to_dir(3, seed=3, out_dir=str(tmp_path / "out"))
    assert r["written"] == 3
    pngs = glob.glob(str(tmp_path / "out" / "**" / "*.png"), recursive=True)
    assert len(pngs) == 3


def test_serve_nfe_per_dispatch_bit_identical(tmp_path):
    """evaluation.nfe_per_dispatch in serving: the segmented service must
    write byte-identical PNGs to the whole-scan service for the same seed
    (same knob + identity contract as eval/generate.py)."""
    import jax  # noqa: F401

    from psld_tpu.config import compose
    from psld_tpu.serve.server import SamplerService
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    base = [
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.name=synthetic",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.evaluation.batch_size=2",
        "dataset.diffusion.evaluation.n_discrete_steps=6",
        "dataset.diffusion.evaluation.sample_from=target",
        f"dataset.diffusion.evaluation.chkpt_path={tmp_path}/ckpt",
    ]
    cfg = compose(base).dataset.diffusion
    net = build_score_model(cfg)
    state = init_state(init_score_params(net, cfg, 0),
                       make_optimizer(cfg.training.optimizer))
    ckpt.save_checkpoint(str(tmp_path), "ckpt", state)

    outs = {}
    for tag, extra in (("whole", []),
                       ("seg", ["+dataset.diffusion.evaluation."
                                "nfe_per_dispatch=2"])):
        svc = SamplerService(compose(base + extra).dataset.diffusion)
        r = svc.sample_to_dir(4, seed=7, out_dir=str(tmp_path / tag))
        assert r["written"] == 4
        outs[tag] = sorted(glob.glob(str(tmp_path / tag / "**" / "*.png"),
                                     recursive=True))
    assert len(outs["whole"]) == len(outs["seg"]) == 4
    for a, b in zip(outs["whole"], outs["seg"]):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), a
