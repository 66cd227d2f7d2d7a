"""The driver benchmark entry (psld_tpu/eval/bench.py + root bench.py)
must keep producing its one-line JSON contract."""

import json
import subprocess
import sys


def test_run_bench_smoke(monkeypatch):
    monkeypatch.setenv("PSLD_BENCH_BATCH", "2")
    monkeypatch.setenv("PSLD_BENCH_NFE", "3")
    monkeypatch.setenv("PSLD_BENCH_NF", "8")
    from psld_tpu.eval.bench import run_bench

    out = run_bench()
    assert {"metric", "value", "unit", "vs_baseline",
            "baseline_is_estimate"} <= set(out)
    assert out["unit"] == "img/s"
    assert out["value"] > 0
    assert out["baseline_is_estimate"] is True
    if "mfu_vs_v5e_bf16_peak" in out:
        assert out["program_tflops"] >= 0
        assert out["mfu_vs_v5e_bf16_peak"] >= 0
    json.dumps(out)  # JSON-serializable


def test_root_bench_imports():
    # the driver runs `python bench.py`; the wrapper must resolve
    code = ("import bench; "
            "assert callable(bench.main)")
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")
