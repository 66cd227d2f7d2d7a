"""Render results_r5_matrix.jsonl as the PARITY markdown table.

Usage: python scripts/r5_matrix_table.py [results_jsonl]
Prints one row per (sampler, stride) with SWD-avg + TV-delta per NFE,
plus a throughput column block — the round-5 flagship quality matrix.
"""

from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "scripts/results_r5_matrix.jsonl"
    cells = {}
    nfes = set()
    for line in open(path):
        r = json.loads(line)
        if r.get("phase") != "matrix" or "sampler" not in r:
            continue
        key = (r["sampler"], r["stride"])
        nfes.add(r["nfe"])
        swd = (r.get("swd") or {}).get("avg")
        tvd = ((r.get("pixel_stats") or {}).get("delta") or {}).get("tv")
        cells[key + (r["nfe"],)] = {
            "swd": swd, "tv_delta": tvd,
            "img_per_s": r.get("img_per_s"),
            "compile": r.get("includes_compile"),
        }
    nfes = sorted(nfes)
    combos = sorted({(s, st) for (s, st, _) in cells})

    def fmt(v, nd=1):
        return "—" if v is None else f"{v:.{nd}f}"

    print("| sampler / stride | " +
          " | ".join(f"NFE {n}" for n in nfes) + " |")
    print("|---" * (len(nfes) + 1) + "|")
    for metric, nd in (("swd", 1), ("tv_delta", 4), ("img_per_s", 1)):
        print(f"**{metric}**")
        for s, st in combos:
            row = [fmt((cells.get((s, st, n)) or {}).get(metric), nd)
                   for n in nfes]
            print(f"| {s} {st} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
