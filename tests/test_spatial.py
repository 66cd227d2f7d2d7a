"""Spatial (height) activation parallelism (parallel/spatial.py): mesh
construction, numerical parity of the spatially sharded train step with the
replicated-DP step, a single sample spanning the whole mesh (the case DDP
fundamentally cannot express — reference main/train_sde.py:114), and the
training.spatial loop wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from psld_tpu.parallel.spatial import (
    check_divisible,
    make_spatial_mesh,
    spatial_batch_sharding,
    spatial_batch_spec,
)
from psld_tpu.train.state import init_state
from psld_tpu.train.steps import make_train_step

from test_fsdp import _gather, _run_steps
from test_train_step import tiny_setup


def test_spatial_mesh_and_specs():
    mesh = make_spatial_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    # consecutive devices form a spatial group (adjacent ICI links carry
    # the per-conv halo exchanges)
    assert [d.id for d in mesh.devices[0]] == [0, 1, 2, 3]
    assert spatial_batch_spec() == P("data", "spatial")
    assert spatial_batch_spec(batch_axis=1) == P(None, "data", "spatial")
    with pytest.raises(ValueError):
        make_spatial_mesh(3)
    with pytest.raises(ValueError):
        check_divisible(10, make_spatial_mesh(4))
    check_divisible(32, make_spatial_mesh(8))


def test_spatial_step_matches_replicated_dp():
    """(data=2, spatial=4): the height-sharded train step follows the same
    optimization trajectory as plain DP — XLA's halo exchange + reduction
    placement only reorders float accumulation."""
    cfg, sde, net, criterion, params = tiny_setup()
    rng = jax.random.PRNGKey(3)
    raw = [jax.random.normal(jax.random.PRNGKey(10 + i), (16, 8, 8, 3),
                             jnp.float32) for i in range(3)]

    mesh_dp = make_mesh()
    step_dp, opt = make_train_step(net, sde, criterion, cfg, donate=False)
    s_dp = replicate(init_state(params, opt), mesh_dp)
    s_dp, losses_dp = _run_steps(
        step_dp, s_dp, [shard_batch(b, mesh_dp) for b in raw], rng)

    mesh_sp = make_spatial_mesh(4)
    step_sp, opt2 = make_train_step(net, sde, criterion, cfg, donate=False)
    s_sp = replicate(init_state(params, opt2), mesh_sp)
    batches = [shard_batch(b, mesh_sp,
                           sharding=spatial_batch_sharding(mesh_sp))
               for b in raw]
    s_sp, losses_sp = _run_steps(step_sp, s_sp, batches, rng)

    np.testing.assert_allclose(losses_sp, losses_dp, rtol=1e-4)
    for a, b in zip(_gather(s_dp.params), _gather(s_sp.params)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)
    for a, b in zip(_gather(s_dp.ema_params), _gather(s_sp.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_single_sample_spans_whole_mesh():
    """batch=1 over (data=1, spatial=8): ONE image's activations split
    across all 8 devices — the activation-parallel regime."""
    cfg, sde, net, criterion, params = tiny_setup()
    mesh = make_spatial_mesh(8)
    assert dict(mesh.shape) == {"data": 1, "spatial": 8}
    b = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 3), jnp.float32)
    batch = shard_batch(b, mesh, sharding=spatial_batch_sharding(mesh))
    # the input really is split along H: every device holds a (1,1,8,3) row
    shard_shapes = {s.data.shape for s in batch.addressable_shards}
    assert shard_shapes == {(1, 1, 8, 3)}

    step_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False)
    state = replicate(init_state(params, opt), mesh)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_spatial_composes_with_multi_step_dispatch():
    """[K, B, H, W, C] inputs shard as P(None, data, spatial)."""
    from psld_tpu.train.steps import make_multi_train_step

    cfg, sde, net, criterion, params = tiny_setup()
    mesh = make_spatial_mesh(4)
    k, bsz = 2, 4
    raw = jax.random.normal(jax.random.PRNGKey(11), (k, bsz, 8, 8, 3),
                            jnp.float32)
    batch = shard_batch(raw, mesh, batch_axis=1,
                        sharding=spatial_batch_sharding(mesh, batch_axis=1))

    multi_fn, opt = make_multi_train_step(net, sde, criterion, cfg, k,
                                          donate=False)
    state = replicate(init_state(params, opt), mesh)
    state, metrics = multi_fn(state, batch, jax.random.PRNGKey(0))
    assert int(state.step) == k
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))

    # parity vs the single-step program on the same data
    single_fn, opt2 = make_train_step(net, sde, criterion, cfg, donate=False)
    s2 = replicate(init_state(params, opt2), mesh)
    losses = []
    for i in range(k):
        bi = shard_batch(raw[i], mesh,
                         sharding=spatial_batch_sharding(mesh))
        s2, m = single_fn(s2, bi, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses,
                               rtol=1e-5)


@pytest.fixture(scope="module")
def spatial_trained(tmp_path_factory):
    """training.spatial=4 drives the real loop (synthetic data): 2-D mesh,
    global batch multiplies over `data` only, checkpoints written."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    workdir = tmp_path_factory.mktemp("spatial_e2e")
    results = str(workdir / "results")
    argv = [
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={workdir}",
        "dataset.diffusion.data.image_size=16",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
        "dataset.diffusion.model.score_fn.dropout=0.0",
        "dataset.diffusion.training.batch_size=2",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
    ]
    cfg = compose(argv + ["+dataset.diffusion.training.spatial=4"]
                  ).dataset.diffusion
    state = train_sde(cfg, max_steps=2)
    assert int(state.step) == 2
    assert np.isfinite(float(jnp.sum(
        jax.tree_util.tree_leaves(state.params)[0])))
    ckpts = [c for c in glob.glob(f"{results}/checkpoints/*epoch*")
             if not c.endswith(".meta.json")]
    assert ckpts
    return workdir, argv, ckpts[0]


def test_train_loop_spatial_e2e(spatial_trained):
    workdir, argv, ckpt = spatial_trained
    assert "epoch=0000" in ckpt


def test_sample_spatial_matches_batch_sharded(spatial_trained):
    """evaluation.spatial=4 (one latent's height split over 4 devices)
    writes the same PNGs as the batch-sharded run: the traced prior draw is
    placement-independent, so only float reduction order differs — at most
    one uint8 quantization step per pixel."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample
    from psld_tpu.utils.images import load_images_rgb

    workdir, argv, ckpt = spatial_trained
    outs = {}
    for tag, extra in (("dp", []),
                       ("sp", ["+dataset.diffusion.evaluation.spatial=4"])):
        save = str(workdir / f"samples_{tag}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
            f"dataset.diffusion.evaluation.save_path={save}",
            "dataset.diffusion.evaluation.n_samples=4",
            "dataset.diffusion.evaluation.batch_size=2",
            "dataset.diffusion.evaluation.n_discrete_steps=5",
        ] + extra).dataset.diffusion
        assert sample(cfg) == 4
        pngs = sorted(glob.glob(f"{save}/images/*.png"))
        assert len(pngs) == 4, pngs
        outs[tag] = load_images_rgb(pngs).astype(np.int16)
    diff = np.abs(outs["dp"] - outs["sp"]).max()
    assert diff <= 1, f"max pixel diff {diff}"


def test_train_loop_spatial_indivisible_raises(tmp_path):
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    cfg = compose([
        "+dataset=cifar10/cifar10_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=18",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        f"dataset.diffusion.training.results_dir={tmp_path / 'r'}",
        "+dataset.diffusion.training.spatial=4",
    ]).dataset.diffusion
    with pytest.raises(ValueError, match="not divisible"):
        train_sde(cfg, max_steps=1)


def test_shared_jit_cache_distinguishes_width_and_spatial(spatial_trained):
    """Regression: per_step and the batch sharding are baked into the
    cached sampler closure, so a jit_cache shared across calls differing
    in batch_size or evaluation.spatial must MISS, not reuse the wrong
    program (the old key matched on sampler/NFE alone and silently ran
    the previous call's width)."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample

    workdir, argv, ckpt = spatial_trained
    cache = {}
    for tag, extra, want in (
            ("a", ["dataset.diffusion.evaluation.batch_size=2"], 4),
            ("b", ["dataset.diffusion.evaluation.batch_size=1"], 4),
            ("c", ["dataset.diffusion.evaluation.batch_size=1",
                   "+dataset.diffusion.evaluation.spatial=4"], 4),
    ):
        save = str(workdir / f"jc_{tag}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
            f"dataset.diffusion.evaluation.save_path={save}",
            "dataset.diffusion.evaluation.n_samples=4",
            "dataset.diffusion.evaluation.n_discrete_steps=5",
        ] + extra).dataset.diffusion
        assert sample(cfg, jit_cache=cache) == want
        assert len(glob.glob(f"{save}/images/*.png")) == want
    assert len(cache) == 3  # three distinct programs, no false sharing


def test_inpaint_with_spatial_sharding(spatial_trained):
    """evaluation.spatial also covers the inpainting path: the (image,
    mask) TUPLE batch shards over (data, spatial) and the run writes the
    full images/batch/corrupt layout."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import inpaint

    workdir, argv, ckpt = spatial_trained
    save = str(workdir / "inpaint_sp")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=ip_em_sde",
        "dataset.diffusion.evaluation.n_samples=2",
        "dataset.diffusion.evaluation.batch_size=1",
        "dataset.diffusion.evaluation.n_discrete_steps=5",
        "+dataset.diffusion.evaluation.spatial=4",
    ]).dataset.diffusion
    assert inpaint(cfg) == 2
    for sub in ("images", "batch", "corrupt"):
        assert len(glob.glob(f"{save}/{sub}/*.png")) == 2, sub


def test_celebahq256_extension_config_composes_and_trains(tmp_path):
    """The CelebA-HQ-256 extension config (no reference counterpart; the
    paper's high-res experiment) composes, and its scaling-knob stack
    (remat + fsdp + spatial + grad_accum) trains a step at smoke scale
    through the real loop on the virtual mesh."""
    import glob

    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    # synthetic stand-in at 32x32 with the SAME knob stack; the full-res
    # defaults are exercised at compose time (structure + key tree)
    full = compose([
        "+dataset=celebahq/celebahq256_psld",
        "dataset.diffusion.data.root=/tmp",
        "dataset.diffusion.training.results_dir=/tmp/r",
    ]).dataset.diffusion
    assert int(full.data.image_size) == 256
    assert list(full.model.score_fn.ch_mult) == [1, 1, 2, 2, 2, 2, 2]
    assert str(full.model.sde.name) == "psld"

    results = str(tmp_path / "results")
    cfg = compose([
        "+dataset=celebahq/celebahq256_psld",
        "dataset.diffusion.data.name=synthetic",
        f"dataset.diffusion.data.root={tmp_path}",
        "dataset.diffusion.data.image_size=32",
        "dataset.diffusion.model.score_fn.nf=8",
        "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
        "dataset.diffusion.model.score_fn.num_res_blocks=1",
        "dataset.diffusion.model.score_fn.attn_resolutions=[16]",
        "dataset.diffusion.training.batch_size=2",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
        "+dataset.diffusion.training.remat=true",
        "+dataset.diffusion.training.fsdp=true",
        "+dataset.diffusion.training.spatial=2",
        "+dataset.diffusion.training.grad_accum=2",
    ]).dataset.diffusion
    state = train_sde(cfg, max_steps=2)
    assert int(state.step) == 2
    assert [c for c in glob.glob(f"{results}/checkpoints/*epoch*")
            if not c.endswith(".meta.json")]
