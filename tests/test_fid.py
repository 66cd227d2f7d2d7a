"""FID pipeline tests: Frechet distance math vs closed form, streaming
moments, pooling-semantics oracles vs torch, inception graph shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from psld_tpu.eval.fid import (
    FID_DIM,
    FeatureMoments,
    frechet_distance,
    random_params,
)
from psld_tpu.eval.fid.inception import (
    _avgpool_nocountpad,
    _maxpool,
    extract_features,
)


def test_frechet_closed_form_gaussians():
    """For isotropic Gaussians: d^2 = |m1-m2|^2 + (s1-s2)^2 * D."""
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 0.5
    s1, s2 = 1.0, 2.0
    got = frechet_distance(mu1, np.eye(d) * s1**2, mu2, np.eye(d) * s2**2)
    want = 0.25 * d + (s1 - s2) ** 2 * d
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_frechet_identity_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    mu, cov = a.mean(0), np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_streaming_moments_match_batch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 16))
    m = FeatureMoments.zeros(16)
    for chunk in np.split(x, 10):
        m = m.update(chunk)
    mu, cov = m.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)


def test_moments_merge_across_devices():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(256, 8))
    full = FeatureMoments.zeros(8).update(x)
    a = FeatureMoments.zeros(8).update(x[:100])
    b = FeatureMoments.zeros(8).update(x[100:])
    merged = a.merge(b)
    for g, w in zip(merged.finalize(), full.finalize()):
        np.testing.assert_allclose(g, w, atol=1e-12)


def test_avgpool_matches_torch_count_include_pad_false():
    x = np.random.default_rng(3).normal(size=(2, 9, 9, 5)).astype(np.float32)
    got = np.asarray(_avgpool_nocountpad(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.avg_pool2d(xt, 3, stride=1, padding=1,
                        count_include_pad=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxpool_matches_torch():
    x = np.random.default_rng(4).normal(size=(2, 17, 17, 3)).astype(np.float32)
    got = np.asarray(_maxpool(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.max_pool2d(xt, 3, stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.fixture(scope="module")
def params():
    return random_params(jax.random.PRNGKey(0))


def test_inception_feature_shape(params):
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    feats = extract_features(params, imgs)
    assert feats.shape == (2, FID_DIM)
    assert bool(jnp.isfinite(feats).all())


def test_inception_resize_invariance_of_shape(params):
    """Any input resolution maps through the same 299x299 graph."""
    for size in (32, 64):
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (1, size, size, 3))
        assert extract_features(params, imgs).shape == (1, FID_DIM)


def test_inception_deterministic(params):
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    a = extract_features(params, imgs)
    b = extract_features(params, imgs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inception_gold_graph_vs_torch_oracle(tmp_path):
    """Numerical gold test of the assembled 2048-d pool3 graph.

    A random state_dict with the exact pt_inception-2015-12-05 key names is
    saved to .pth, loaded through load_torch_checkpoint (BN folding), and
    the JAX forward is compared feature-for-feature against an independent
    plain-torch transcription of the FID InceptionV3 (inception_oracle.py)
    running conv->BN->relu unfolded. Any wiring error -- swapped branch,
    wrong stride/pad, wrong pool semantics, wrong resize -- shifts features
    far beyond the tolerance."""
    from inception_oracle import FIDInceptionOracle, random_state_dict

    from psld_tpu.eval.fid import load_torch_checkpoint

    sd = random_state_dict(seed=0)
    path = tmp_path / "pt_inception-2015-12-05-test.pth"
    torch.save(sd, path)
    params_jax = load_torch_checkpoint(str(path))

    oracle = FIDInceptionOracle()
    oracle.load_state_dict(sd, strict=True)
    oracle.eval()

    rng = np.random.default_rng(7)
    for shape, resize in (((3, 32, 32, 3), True), ((2, 299, 299, 3), False)):
        imgs = rng.random(shape, dtype=np.float32)
        got = np.asarray(
            extract_features(params_jax, jnp.asarray(imgs), resize=resize))
        want = oracle(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                      resize=resize).numpy()
        assert got.shape == want.shape == (shape[0], FID_DIM)
        scale = float(np.abs(want).mean())
        np.testing.assert_allclose(got, want, rtol=2e-3,
                                   atol=2e-3 * scale,
                                   err_msg=f"shape={shape} resize={resize}")


def test_fid_cli_on_dirs(tmp_path, params, monkeypatch):
    """End-to-end through the CLI with random weights: FID(X, X) = 0 and
    FID(X, Y) > 0."""
    from PIL import Image

    rng = np.random.default_rng(5)
    for sub, shift in (("a", 0), ("b", 80)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(8):
            img = (rng.integers(0, 175, (16, 16, 3)) + shift).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")

    from psld_tpu.cli.fid import main

    fid_aa = main(["--input1", str(tmp_path / "a"), "--input2",
                   str(tmp_path / "a"), "--batch", "4"])
    fid_ab = main(["--input1", str(tmp_path / "a"), "--input2",
                   str(tmp_path / "b"), "--batch", "4",
                   "--save-stats1", str(tmp_path / "a.npz")])
    assert abs(fid_aa) < 1e-3
    assert fid_ab > fid_aa
    # stats re-use path
    fid_npz = main(["--input1", str(tmp_path / "a.npz"), "--input2",
                    str(tmp_path / "b"), "--batch", "4"])
    np.testing.assert_allclose(fid_npz, fid_ab, rtol=1e-4)
