"""FSDP (ZeRO-style parameter/optimizer sharding, parallel/fsdp.py):
spec selection, numerical parity with the replicated DP step, actual
shardedness of the training state, the 2-D (data, model) hybrid layout,
and the training.fsdp loop wiring."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psld_tpu.parallel.fsdp import (
    fsdp_spec,
    per_device_bytes,
    shard_tree,
    tree_shardings,
)
from psld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from psld_tpu.train.state import init_state
from psld_tpu.train.steps import make_train_step

from test_train_step import tiny_setup


def test_fsdp_spec_selection():
    # largest divisible dim wins; ties prefer the trailing dim
    assert fsdp_spec((3, 3, 64, 128), 8, min_size=0) == P(None, None, None,
                                                          "data")
    assert fsdp_spec((128, 128), 8, min_size=0) == P(None, "data")
    assert fsdp_spec((256, 16), 8, min_size=0) == P("data", None)
    # no divisible dim -> replicated
    assert fsdp_spec((3, 3, 5, 7), 8, min_size=0) == P()
    # scalars and small leaves -> replicated
    assert fsdp_spec((), 8, min_size=0) == P()
    assert fsdp_spec((16, 16), 8, min_size=2 ** 14) == P()
    # custom axis name
    assert fsdp_spec((64,), 4, axis_name="model", min_size=0) == P("model")


def _gather(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _run_steps(step_fn, state, batches, rng):
    losses = []
    for b in batches:
        state, metrics = step_fn(state, b, rng)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_fsdp_step_matches_replicated_dp():
    """FSDP over the 1-D data axis computes the same optimization
    trajectory as the replicated DP step (reduce-scatter + sharded Adam vs
    all-reduce + replicated Adam differ only in reduction order)."""
    cfg, sde, net, criterion, params = tiny_setup()
    mesh = make_mesh()
    rng = jax.random.PRNGKey(3)
    batches = [
        shard_batch(
            jax.random.normal(jax.random.PRNGKey(10 + i), (16, 8, 8, 3),
                              jnp.float32), mesh)
        for i in range(3)
    ]

    rep_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False)
    s_rep = replicate(init_state(params, opt), mesh)
    s_rep, losses_rep = _run_steps(rep_fn, s_rep, batches, rng)

    pshard = tree_shardings(params, mesh, min_size=0)
    fsdp_fn, opt2 = make_train_step(net, sde, criterion, cfg, donate=False,
                                    param_shardings=pshard)
    s_fsdp = shard_tree(init_state(params, opt2), mesh, min_size=0)
    s_fsdp, losses_fsdp = _run_steps(fsdp_fn, s_fsdp, batches, rng)

    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=1e-5)
    for a, b in zip(_gather(s_rep.params), _gather(s_fsdp.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
    for a, b in zip(_gather(s_rep.ema_params), _gather(s_fsdp.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fsdp_state_stays_sharded_and_smaller():
    """Sharded leaves stay sharded through the step (no silent
    re-replication by XLA) and the per-device state footprint shrinks."""
    cfg, sde, net, criterion, params = tiny_setup()
    mesh = make_mesh()
    pshard = tree_shardings(params, mesh, min_size=0)
    step_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False,
                                   param_shardings=pshard)

    s_rep = replicate(init_state(params, opt), mesh)
    s_fsdp = shard_tree(init_state(params, opt), mesh, min_size=0)
    assert per_device_bytes(s_fsdp) < per_device_bytes(s_rep) * 0.5

    batch = shard_batch(
        jax.random.normal(jax.random.PRNGKey(2), (16, 8, 8, 3), jnp.float32),
        mesh)
    s_fsdp, _ = step_fn(s_fsdp, batch, jax.random.PRNGKey(3))

    n_sharded = 0
    flat, _ = jax.tree_util.tree_flatten(s_fsdp.params)
    flat_spec, _ = jax.tree_util.tree_flatten(pshard)
    for leaf, want in zip(flat, flat_spec):
        if want.spec != P():
            assert not leaf.sharding.is_fully_replicated, leaf.shape
            n_sharded += 1
    assert n_sharded > 0
    assert per_device_bytes(s_fsdp.params) < per_device_bytes(
        replicate(params, mesh)) * 0.5


def test_fsdp_hybrid_2d_mesh_parity():
    """(data=4, model=2) hybrid: batch sharded over `data`, params over
    `model` — matches the replicated trajectory too."""
    cfg, sde, net, criterion, params = tiny_setup()
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    rng = jax.random.PRNGKey(3)
    raw = [jax.random.normal(jax.random.PRNGKey(10 + i), (16, 8, 8, 3),
                             jnp.float32) for i in range(2)]
    batches = [jax.device_put(b, NamedSharding(mesh, P("data")))
               for b in raw]

    rep_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False)
    s_rep = jax.device_put(init_state(params, opt),
                           NamedSharding(mesh, P()))
    s_rep, losses_rep = _run_steps(rep_fn, s_rep, batches, rng)

    pshard = tree_shardings(params, mesh, axis_name="model", min_size=0)
    fsdp_fn, opt2 = make_train_step(net, sde, criterion, cfg, donate=False,
                                    param_shardings=pshard)
    s_fsdp = shard_tree(init_state(params, opt2), mesh, axis_name="model",
                        min_size=0)
    s_fsdp, losses_fsdp = _run_steps(fsdp_fn, s_fsdp, batches, rng)

    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=1e-5)
    for a, b in zip(_gather(s_rep.params), _gather(s_fsdp.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fsdp_multi_step_dispatch_parity():
    """steps_per_dispatch (lax.scan) composes with FSDP."""
    from psld_tpu.train.steps import make_multi_train_step

    cfg, sde, net, criterion, params = tiny_setup()
    mesh = make_mesh()
    rng = jax.random.PRNGKey(3)
    batches = shard_batch(
        jax.random.normal(jax.random.PRNGKey(2), (3, 16, 8, 8, 3),
                          jnp.float32), mesh, batch_axis=1)

    pshard = tree_shardings(params, mesh, min_size=0)
    single_fn, opt = make_train_step(net, sde, criterion, cfg, donate=False,
                                     param_shardings=pshard)
    s1 = shard_tree(init_state(params, opt), mesh, min_size=0)
    losses_seq = []
    for i in range(3):
        s1, m = single_fn(s1, batches[i], rng)
        losses_seq.append(float(m["loss"]))

    multi_fn, opt2 = make_multi_train_step(net, sde, criterion, cfg, 3,
                                           donate=False,
                                           param_shardings=pshard)
    s2 = shard_tree(init_state(params, opt2), mesh, min_size=0)
    s2, m2 = multi_fn(s2, batches, rng)

    np.testing.assert_allclose(np.asarray(m2["loss"]),
                               np.asarray(losses_seq, np.float32), rtol=1e-5)
    for a, b in zip(_gather(s1.params), _gather(s2.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fsdp_composes_with_scan_blocks():
    """ZeRO-3 sharding over the nn.scan-stacked param layout (round-3
    production knobs together): the stacked leaves carry a leading
    blocks axis, fsdp_spec must still pick a divisible dim, and the
    trajectory must match the replicated scan_blocks run."""
    from psld_tpu.models.ncsnpp import NCSNpp

    cfg, sde, net, criterion, params = tiny_setup()
    cfg.model.score_fn["num_res_blocks"] = 2
    cfg.model.score_fn["scan_blocks"] = True
    net_s = NCSNpp.from_config(cfg)
    params_s = net_s.init(jax.random.PRNGKey(1),
                          jnp.zeros((2, 8, 8, 6), jnp.float32),
                          jnp.full((2,), 0.5, jnp.float32))
    from psld_tpu.models.scan_params import SCAN_RE

    assert any(SCAN_RE.match(k) for k in params_s["params"]), \
        list(params_s["params"])
    mesh = make_mesh()
    rng = jax.random.PRNGKey(3)
    batches = [
        shard_batch(
            jax.random.normal(jax.random.PRNGKey(10 + i), (16, 8, 8, 3),
                              jnp.float32), mesh)
        for i in range(2)
    ]

    rep_fn, opt = make_train_step(net_s, sde, criterion, cfg, donate=False)
    s_rep = replicate(init_state(params_s, opt), mesh)
    s_rep, losses_rep = _run_steps(rep_fn, s_rep, batches, rng)

    pshard = tree_shardings(params_s, mesh, min_size=0)
    fsdp_fn, opt2 = make_train_step(net_s, sde, criterion, cfg,
                                    donate=False, param_shardings=pshard)
    s_fsdp = shard_tree(init_state(params_s, opt2), mesh, min_size=0)
    s_fsdp, losses_fsdp = _run_steps(fsdp_fn, s_fsdp, batches, rng)

    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=1e-5)
    for a, b in zip(_gather(s_rep.params), _gather(s_fsdp.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_train_loop_fsdp_e2e(tmp_path):
    """training.fsdp=true drives the real loop end-to-end (synthetic data)
    and checkpoints restore."""
    import glob

    from psld_tpu.config import compose
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
        "dataset.diffusion.model.score_fn.dropout=0.0",
        "dataset.diffusion.training.batch_size=2",
        "dataset.diffusion.training.epochs=1",
        "dataset.diffusion.training.chkpt_interval=1",
        f"dataset.diffusion.training.results_dir={results}",
        "+dataset.diffusion.training.fsdp=true",
    ]).dataset.diffusion
    state = train_sde(cfg, max_steps=2)
    assert int(state.step) == 2
    assert np.isfinite(float(jnp.sum(
        jax.tree_util.tree_leaves(state.params)[0])))
    # default min-size keeps tiny nets replicated, but big leaves of the
    # real net would shard; here just assert the loop ran and checkpointed
    assert glob.glob(f"{results}/checkpoints/*epoch*")
