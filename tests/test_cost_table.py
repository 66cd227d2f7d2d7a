"""Unit tests for the parallelism cost-table tooling
(scripts/cost_table_parallel.py): the HLO collective parser must count
bytes correctly for sync and async collective forms, since the PARITY
cost matrix is derived from it."""

import importlib.util
import os
import sys

import pytest


def _load():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "cost_table_parallel.py")
    os.environ["PSLD_COST_CHILD"] = "1"  # suppress the re-exec shim
    spec = importlib.util.spec_from_file_location("cost_table", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


HLO = """
ENTRY %main {
  %p0 = f32[16,128]{1,0} parameter(0)
  %ag = f32[128,128]{1,0} all-gather(f32[16,128]{1,0} %p0), dimensions={0}
  %ar = f32[16,128]{1,0} all-reduce(f32[16,128]{1,0} %p0), to_apply=%add
  %rs = f32[2,128]{1,0} reduce-scatter(f32[16,128]{1,0} %p0), dimensions={0}
  %cp = bf16[4,64]{1,0} collective-permute(bf16[4,64]{1,0} %x), source_target_pairs={{0,1}}
  %ags = (f32[16,128]{1,0}, f32[128,128]{1,0}) all-gather-start(f32[16,128]{1,0} %p0), dimensions={0}
  %agd = f32[128,128]{1,0} all-gather-done((f32[16,128], f32[128,128]) %ags)
  ROOT %out = f32[16,128]{1,0} add(%ar, %p0)
}
"""


def test_collective_bytes_counts_each_kind():
    mod = _load()
    res = mod.collective_bytes(HLO)
    b = res["bytes_per_device"]
    # sync all-gather output 128*128*4 + async -start result (not the
    # operand alias) 128*128*4; -done not double counted
    assert b["all-gather"] == 2 * 128 * 128 * 4
    assert b["all-reduce"] == 16 * 128 * 4
    assert b["reduce-scatter"] == 2 * 128 * 4
    assert b["collective-permute"] == 4 * 64 * 2  # bf16
    assert res["n_ops"]["all-gather"] == 2


def test_collective_bytes_empty_for_single_device_hlo():
    mod = _load()
    res = mod.collective_bytes(
        "%m = f32[8]{0} multiply(f32[8]{0} %a, f32[8]{0} %b)")
    assert res["bytes_per_device"] == {}
    assert res["n_ops"] == {}
