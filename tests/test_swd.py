"""Sliced Wasserstein distance metric (psld_tpu/eval/swd.py)."""

import json

import numpy as np
import pytest

from psld_tpu.eval.swd import (laplacian_pyramid, sliced_wasserstein,
                               swd_dirs)


def _write_dir(path, imgs):
    from PIL import Image

    path.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(imgs):
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            path / f"img_{i}.png")


def _textured(rng, n, freq=2.0):
    """Structured images: smooth sinusoidal gradients + per-image phase."""
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    out = []
    for _ in range(n):
        ph = rng.uniform(0, 2 * np.pi, size=3)
        img = np.stack([0.5 + 0.4 * np.sin(freq * 2 * np.pi * (xx + yy) +
                                           p) for p in ph], axis=-1)
        out.append(img.astype(np.float32))
    return out


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("swd")
    rng = np.random.default_rng(0)
    # 64 images per set: SWD carries finite-sample bias, so two draws of
    # the SAME distribution only land close once the set is large enough
    # (16-image sets measured at 141 vs 221 against noise; 64-image at
    # 49 vs 199)
    _write_dir(root / "tex_a", _textured(rng, 64))
    _write_dir(root / "tex_b", _textured(rng, 64))
    _write_dir(root / "noise",
               [rng.uniform(size=(32, 32, 3)).astype(np.float32)
                for _ in range(64)])
    return root


def test_pyramid_reconstructs():
    """Laplacian levels + the upsampled base must reconstruct the input
    (the decomposition drops no information)."""
    from psld_tpu.eval.swd import _up

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 32, 32, 3))
    levels = laplacian_pyramid(x, min_res=8)
    recon = levels[-1]
    for lap in reversed(levels[:-1]):
        recon = _up(recon) + lap
    np.testing.assert_allclose(recon, x, atol=1e-10)


def test_swd_identical_sets_is_zero():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((512, 20))
    assert sliced_wasserstein(a, a) < 1e-12


def test_swd_separates_distributions():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((2048, 20))
    b = rng.standard_normal((2048, 20))
    c = rng.standard_normal((2048, 20)) * 2.0 + 1.0
    near = sliced_wasserstein(a, b)
    far = sliced_wasserstein(a, c)
    assert far > 5 * near


def test_swd_dirs_ranks_noise_below_same_distribution(dirs):
    """Same-distribution sample sets must land far closer than noise —
    the distributional ranking pixel moments can miss."""
    same = swd_dirs(str(dirs / "tex_a"), str(dirs / "tex_b"))
    noise = swd_dirs(str(dirs / "tex_a"), str(dirs / "noise"))
    assert noise["avg"] > 3 * same["avg"], (same, noise)
    # per-level keys present: 32x32 Laplacian + 16x16 base
    assert "32x32" in same and "16x16" in same


def test_swd_dirs_deterministic(dirs):
    a = swd_dirs(str(dirs / "tex_a"), str(dirs / "noise"))
    b = swd_dirs(str(dirs / "tex_a"), str(dirs / "noise"))
    assert a == b


def test_swd_dirs_shape_mismatch(dirs, tmp_path):
    _write_dir(tmp_path / "small",
               [np.full((16, 16, 3), 0.5, np.float32)])
    with pytest.raises(ValueError, match="shapes differ"):
        swd_dirs(str(dirs / "tex_a"), str(tmp_path / "small"))


def test_pixel_stats_cli_swd_flag(dirs, capsys):
    from psld_tpu.cli.pixel_stats import main

    main(["--input1", str(dirs / "tex_a"), "--input2", str(dirs / "noise"),
          "--swd"])
    out = json.loads(capsys.readouterr().out)
    assert "swd" in out and out["swd"]["avg"] > 0
