"""KID + Inception Score tests: estimator math vs brute-force oracles,
distributional behavior, the fc logits head vs the torch oracle, and the
fidelity-CLI surface (reference quality gate: scripts_psld/fid.sh:1 uses the
torch-fidelity tool, which also ships --kid/--isc)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from psld_tpu.eval.fid import (
    N_LOGITS,
    isc_from_logits,
    kid_from_features,
    polynomial_mmd2_unbiased,
)


def _mmd2_bruteforce(x, y, degree=3, gamma=None, coef0=1.0):
    """Double-loop unbiased MMD^2 oracle."""
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    k = lambda a, b: (gamma * float(a @ b) + coef0) ** degree
    m = x.shape[0]
    s_xx = sum(k(x[i], x[j]) for i in range(m) for j in range(m) if i != j)
    s_yy = sum(k(y[i], y[j]) for i in range(m) for j in range(m) if i != j)
    s_xy = sum(k(x[i], y[j]) for i in range(m) for j in range(m))
    return s_xx / (m * (m - 1)) + s_yy / (m * (m - 1)) - 2 * s_xy / (m * m)


def test_mmd2_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5))
    y = rng.normal(size=(7, 5)) + 0.3
    got = polynomial_mmd2_unbiased(x, y)
    want = _mmd2_bruteforce(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_kid_same_distribution_near_zero_and_shift_positive():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(400, 16))
    b = rng.normal(size=(400, 16))          # same distribution
    c = rng.normal(size=(400, 16)) + 1.0    # shifted
    kid_same, _ = kid_from_features(a, b, subsets=20, subset_size=100)
    kid_shift, _ = kid_from_features(a, c, subsets=20, subset_size=100)
    assert abs(kid_same) < 0.05
    assert kid_shift > 10 * max(abs(kid_same), 1e-6)


def test_kid_deterministic_and_subset_clamped():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(30, 8))
    b = rng.normal(size=(50, 8))
    r1 = kid_from_features(a, b, subsets=5, subset_size=1000, seed=3)
    r2 = kid_from_features(a, b, subsets=5, subset_size=1000, seed=3)
    assert r1 == r2  # subset_size silently clamps to min(n1, n2) = 30
    with pytest.raises(ValueError):
        kid_from_features(a[:1], b, subsets=2)


def test_isc_uniform_is_one_and_peaked_is_nclasses():
    n, c = 200, 10
    uniform = np.zeros((n, c))
    mean_u, std_u = isc_from_logits(uniform, splits=4)
    np.testing.assert_allclose(mean_u, 1.0, atol=1e-6)
    np.testing.assert_allclose(std_u, 0.0, atol=1e-6)
    # confidently peaked, uniform marginal -> IS ~ n_classes
    peaked = np.full((n, c), -50.0)
    peaked[np.arange(n), np.arange(n) % c] = 50.0
    mean_p, _ = isc_from_logits(peaked, splits=4)
    np.testing.assert_allclose(mean_p, c, rtol=1e-3)


def test_isc_matches_direct_split_computation():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(60, 7)) * 2
    got_mean, got_std = isc_from_logits(logits, splits=3)
    p = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    scores = []
    for chunk in np.array_split(p, 3):
        marginal = chunk.mean(0)
        kl = (chunk * (np.log(chunk + 1e-16)
                       - np.log(marginal + 1e-16))).sum(1).mean()
        scores.append(np.exp(kl))
    np.testing.assert_allclose(got_mean, np.mean(scores), rtol=1e-10)
    np.testing.assert_allclose(got_std, np.std(scores), rtol=1e-8)


def test_fc_logits_gold_vs_torch_oracle(tmp_path):
    """load_torch_checkpoint picks up fc.weight/fc.bias and the JAX logits
    path matches the oracle's fc head on the same pool3 features."""
    from inception_oracle import FIDInceptionOracle, random_state_dict

    from psld_tpu.eval.fid import load_torch_checkpoint, logits_from_features

    sd = random_state_dict(seed=1)
    path = tmp_path / "pt_inception-2015-12-05-test.pth"
    torch.save(sd, path)
    params = load_torch_checkpoint(str(path))
    assert params["fc"]["w"].shape == (2048, N_LOGITS)

    oracle = FIDInceptionOracle()
    oracle.load_state_dict(sd, strict=True)
    oracle.eval()

    imgs = np.random.default_rng(5).random((2, 32, 32, 3), dtype=np.float32)
    from psld_tpu.eval.fid import extract_features

    feats = extract_features(params, jnp.asarray(imgs))
    x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    # default = torch-fidelity's 'logits_unbiased' (fc matmul, NO bias)
    got = np.asarray(logits_from_features(params, feats))
    with torch.no_grad():
        want = (oracle.forward(x) @ oracle.fc.weight.T).numpy()
    assert got.shape == want.shape == (2, N_LOGITS)
    scale = float(np.abs(want).mean())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)
    # unbiased=False reproduces the checkpoint's actual fc head
    got_b = np.asarray(logits_from_features(params, feats, unbiased=False))
    want_b = oracle.logits(x).numpy()
    np.testing.assert_allclose(got_b, want_b, rtol=2e-3, atol=2e-3 * scale)


def test_logits_without_fc_raises():
    from psld_tpu.eval.fid import logits_from_features

    with pytest.raises(ValueError, match="fc head"):
        logits_from_features({}, jnp.zeros((1, 2048)))


def test_fidelity_cli_kid_isc(tmp_path, capsys):
    """CLI surface: --fid --kid --isc together on image dirs (random
    weights; checks plumbing + metric signs, not absolute values)."""
    from PIL import Image

    rng = np.random.default_rng(6)
    for sub, shift in (("a", 0), ("b", 80)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(8):
            img = (rng.integers(0, 175, (16, 16, 3)) + shift).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")

    from psld_tpu.cli.fid import main

    main(["--input1", str(tmp_path / "a"), "--input2", str(tmp_path / "b"),
          "--batch", "4", "--fid", "--kid", "--isc",
          "--kid-subsets", "4", "--isc-splits", "2"])
    out = capsys.readouterr().out
    assert "frechet_inception_distance:" in out
    assert "kernel_inception_distance_mean:" in out
    assert "inception_score_mean:" in out

    # ISC alone needs no --input2; KID without --input2 errors.
    main(["--input1", str(tmp_path / "a"), "--batch", "4", "--isc",
          "--isc-splits", "2"])
    assert "inception_score_mean:" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["--input1", str(tmp_path / "a"), "--kid"])


def test_sweep_quality_fn_with_kid(tmp_path):
    """The FID-vs-NFE sweep's quality closure emits kid/kid_std when asked
    (eval/sweep.py); KID(ref, ref) ~ 0 regardless of weights."""
    from inception_oracle import random_state_dict
    from PIL import Image

    from psld_tpu.eval.sweep import _make_quality_fn

    rng = np.random.default_rng(7)
    dirs = {}
    for sub in ("ref", "gen"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(6):
            img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")
        dirs[sub] = str(d)

    wpath = tmp_path / "pt_inception-2015-12-05-test.pth"
    torch.save(random_state_dict(seed=2), wpath)
    quality = _make_quality_fn(dirs["ref"], None, str(wpath), batch=4,
                               kid=True)
    out = quality(dirs["ref"])  # gen == ref -> both metrics ~ 0
    assert abs(out["fid"]) < 1e-3
    assert abs(out["kid"]) < 1e-3 and out["kid_std"] >= 0
    out2 = quality(dirs["gen"])
    assert "kid" in out2 and np.isfinite(out2["kid"])

    with pytest.raises(ValueError, match="KID needs"):
        _make_quality_fn(None, "stats.npz", str(wpath), batch=4, kid=True)
