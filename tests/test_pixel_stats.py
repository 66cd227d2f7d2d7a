"""Weight-free pixel sanity metrics (psld_tpu/eval/pixel_stats.py)."""

import json

import numpy as np
import pytest

from psld_tpu.eval.pixel_stats import compare_dirs, compute_dir_stats


def _write_dir(path, imgs):
    from PIL import Image

    path.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(imgs):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            path / f"img_{i}.png")


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pixstats")
    rng = np.random.default_rng(0)
    # smooth images: constant color fields with slight per-image variation
    smooth = [np.full((16, 16, 3), c, np.float32)
              for c in rng.uniform(0.2, 0.8, size=8)]
    noise = [rng.uniform(size=(16, 16, 3)).astype(np.float32)
             for _ in range(8)]
    collapsed = [np.full((16, 16, 3), 0.5, np.float32) for _ in range(8)]
    _write_dir(root / "smooth", smooth)
    _write_dir(root / "noise", noise)
    _write_dir(root / "collapsed", collapsed)
    return root


def test_tv_separates_noise_from_smooth(dirs):
    s = compute_dir_stats(str(dirs / "smooth"))
    n = compute_dir_stats(str(dirs / "noise"))
    assert s.tv < 0.01 < 0.2 < n.tv
    assert s.n == n.n == 8


def test_diversity_detects_collapse(dirs):
    c = compute_dir_stats(str(dirs / "collapsed"))
    s = compute_dir_stats(str(dirs / "smooth"))
    assert c.diversity < 1e-3
    assert s.diversity > 0.05


def test_compare_dirs_self_is_zero(dirs):
    out = compare_dirs(str(dirs / "smooth"), str(dirs / "smooth"))
    assert out["delta"]["tv"] == 0.0
    assert out["delta"]["hist_l1"] == 0.0


def test_compare_dirs_noise_vs_smooth(dirs):
    out = compare_dirs(str(dirs / "smooth"), str(dirs / "noise"))
    assert out["delta"]["tv"] > 0.2
    assert out["delta"]["hist_l1"] > 0.5


def test_cli_prints_json(dirs, capsys):
    from psld_tpu.cli.pixel_stats import main

    main(["--input1", str(dirs / "smooth"), "--input2", str(dirs / "noise"),
          "--limit", "4"])
    out = json.loads(capsys.readouterr().out)
    assert out["input1"]["n"] == 4
    assert set(out["delta"]) == {"mean", "std", "tv", "diversity", "hist_l1"}


def test_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="no images"):
        compute_dir_stats(str(tmp_path))
