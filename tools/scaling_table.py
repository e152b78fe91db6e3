#!/usr/bin/env python3
"""Per-family scaling-exponent table from two bench scale points.

Usage: python3 tools/scaling_table.py BENCH_sf1.json BENCH_sf10.json 10

Prints a markdown table: for each query present in BOTH artifacts with
positive times, exponent = log(t_hi / t_lo) / log(ratio) — the alpha in
t ~ N^alpha across the data-size step. alpha <= ~1 is linear-or-better
(what a 100 TB claim needs); alpha near 2 is the quadratic smell.
Sub-second lo-times are flagged: their exponents are fixed-cost noise,
not data scaling. Dev harness only (driver-side python), like check.py.
"""
import json, math, sys


def main(lo_path: str, hi_path: str, ratio: float) -> None:
    lo = json.load(open(lo_path))["queries"]
    hi = json.load(open(hi_path))["queries"]
    shared = sorted(k for k in hi if k in lo and lo[k] > 0 and hi[k] > 0)
    print(f"| query | {lo_path} s | {hi_path} s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for k in shared:
        r = hi[k] / lo[k]
        alpha = math.log(r) / math.log(ratio)
        note = " (lo<1s: fixed-cost dominated)" if lo[k] < 1.0 else ""
        print(f"| {k} | {lo[k]:.2f} | {hi[k]:.2f} | {r:.2f}x | "
              f"{alpha:.2f}{note} |")
    missing = sorted(set(hi) - set(lo))
    if missing:
        print(f"\n(not in {lo_path}: {', '.join(missing)})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
