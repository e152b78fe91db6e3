#!/usr/bin/env python3
"""Merge per-family BENCH artifacts into one committed record (r17
verdict item 6: the one-JVM sf10 sweep inflated heavy rows up to 8.6x
over their solo numbers via cross-family JVM/page-cache residue — the
knob sweeps already run ONE FRESH JVM PER FAMILY, and the committed
sf10 record now uses the same protocol).

Usage: python3 tools/merge_bench.py OUT.json FAM1.json [FAM2.json ...]

The merged record keeps the guard-stamp contract keep_best.sh and
make_baseline.py parse ("contended":bool, "anchor":{..."class":...}):
contended is the OR across families, the anchor class is the WORST
class across families (a record is only as trustworthy as its worst
environment window), the ratio is the max. Each family's own stamps
are preserved under "families" so per-row adjudication stays possible.
"""
import json
import sys

CLASS_BADNESS = {"ok": 0, "fast": 0, "degraded": 1, "unknown": 2, "slow": 3}


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    args = sys.argv[1:]
    partial = "--partial" in args
    args = [a for a in args if a != "--partial"]
    out_path, fam_paths = args[0], args[1:]
    queries, failed, families = {}, [], {}
    contended = False
    # class merge key: primary = badness, tie-break prefers the
    # non-"ok" hazard so an all-fast (or mixed ok+fast) sweep stamps
    # "fast", not a class no family had — make_baseline refuses fast
    # records too (a flattering host is also a comparison hazard), and
    # initializing to "ok" laundered that (r18 review finding)
    worst_class, worst_key, worst_ratio = None, (-1, -1), -1.0
    sf = None
    for p in fam_paths:
        with open(p) as f:
            d = json.load(f)
        fam = p.rsplit("_", 1)[-1].removesuffix(".json")
        queries.update(d.get("queries", {}))
        failed.extend(d.get("failed", []))
        contended = contended or bool(d.get("contended"))
        anchor = d.get("anchor", {})
        cls = anchor.get("class", "unknown")
        key = (CLASS_BADNESS.get(cls, 2), 1 if cls != "ok" else 0)
        if worst_class is None or key > worst_key:
            worst_class, worst_key = cls, key
        worst_ratio = max(worst_ratio, float(anchor.get("ratio", -1.0)))
        sf = sf or d.get("sf")
        families[fam] = {
            "value": d.get("value"),
            "contended": bool(d.get("contended")),
            "anchor": anchor,
            "canary": d.get("canary"),
            "loadavg": d.get("loadavg"),
            "gc_sec": d.get("gc_sec"),
            "heap_peak_mb": d.get("heap_peak_mb"),
            "reps": d.get("reps"),
        }
    total = round(sum(v for v in queries.values() if v >= 0), 3)
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": queries, "failed": sorted(set(failed)),
        "anchor": {"class": worst_class or "unknown", "ratio": worst_ratio,
                   "policy": "worst_of_families"},
        "contended": contended,
        "protocol": "one fresh JVM per family (r18; solo-comparable rows)",
        "families": families,
        "sf": sf,
    }
    if partial:
        # a sweep missing families must self-describe: its lower total
        # and smaller query set are NOT comparable to a full record,
        # and round_chain parks it instead of offering it to keep_best
        merged["partial"] = True
    with open(out_path, "w") as f:
        f.write(json.dumps(merged, separators=(",", ":")) + "\n")
    print(f"merged {len(fam_paths)} family artifacts -> {out_path} "
          f"(total {total}s, class {worst_class}, contended {contended})")


if __name__ == "__main__":
    main()
