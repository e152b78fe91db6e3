#!/usr/bin/env python3
"""Re-pin BASELINE.md family subtotals from the committed bench records
(r16 verdict item 2). Reads BENCH_sf0.1.json / BENCH_sf1.json (full
153-query sweeps at the current protocol) and prints the per-family
table + headline rows as markdown; the surrounding prose is maintained
by hand in BASELINE.md. Refuses records whose guard stamps say
polluted (contended:true or anchor class other than ok) — the baseline must
come from clean draws.

Usage: python3 tools/make_baseline.py
"""
import json
import re
import sys

FAMILIES = [
    # (name, predicate) — first match wins; order matters
    ("streaming", lambda q: q.startswith("stream_")
        or q in ("import_loop", "src_out_of_order", "src_queue")),
    ("importer", lambda q: q.startswith("imp_")
        or q in ("src_jsonl", "src_csv", "sink_jdbc",
                 "q_specs_between", "q_specs_match")),
    ("ann/embed", lambda q: q.startswith("ann_") or q.startswith("embed_")
        or q == "dedup_embed"),
    ("text/dedup/pipeline", lambda q: q.startswith("text_")
        or q.startswith("dedup_") or q.startswith("pipe_")),
    ("sketches", lambda q: q.startswith("sketch_")),
    ("layout/opt", lambda q: q.startswith("opt_")),
    ("multimodal", lambda q: q == "mm_pipeline"),
    ("analytics", lambda q: q.startswith("q") or q == "skew_salting"),
]


def family_of(q):
    for name, pred in FAMILIES:
        if pred(q):
            return name
    raise SystemExit(f"unmapped query id: {q} — extend FAMILIES")


def load(path):
    with open(path) as f:
        d = json.load(f)
    guard_notes = []
    if d.get("contended"):
        guard_notes.append("contended:true")
    anchor = d.get("anchor", {})
    # r18 (r17 ADVICE): refuse every non-healthy anchor class, not just
    # "slow" — a degraded-class draw has inflated absolutes and an
    # unknown-class draw has an unverifiable environment; neither may
    # become the number future rounds are graded against. ("fast" is
    # also refused: a faster-than-calibrated host flatters the repo.)
    cls = anchor.get("class")
    if cls not in ("ok",):
        guard_notes.append(f"anchor:{cls}")
    if guard_notes:
        raise SystemExit(
            f"{path} is a polluted draw ({', '.join(guard_notes)}) — "
            "re-draw on a clean host before re-pinning the baseline")
    return d


def main():
    b01 = load("BENCH_sf0.1.json")
    b1 = load("BENCH_sf1.json")
    q01, q1 = b01["queries"], b1["queries"]
    if set(q01) != set(q1):
        print(f"WARNING: sf0.1 and sf1 sweeps differ: "
              f"{sorted(set(q01) ^ set(q1))}", file=sys.stderr)
    fams = {}
    for q, v in q01.items():
        if v < 0:
            raise SystemExit(f"{q} failed in sf0.1 sweep")
        f = family_of(q)
        fams.setdefault(f, [0, 0.0, 0.0])
        fams[f][0] += 1
        fams[f][1] += v
    for q, v in q1.items():
        if v < 0:
            raise SystemExit(f"{q} failed in sf1 sweep")
        fams[family_of(q)][2] += v

    n = len(q01)
    print(f"Headline (n={n} queries):")
    print(f"| sf0.1 total | **{b01['value']} s** | canary ratio "
          f"{b01['canary']['ratio']}, anchor {b01['anchor']['class']} "
          f"[{b01['anchor']['start']}, {b01['anchor']['end']}] |")
    print(f"| sf1 total | **{b1['value']} s** | canary ratio "
          f"{b1['canary']['ratio']}, anchor {b1['anchor']['class']} "
          f"[{b1['anchor']['start']}, {b1['anchor']['end']}] |")
    print()
    print("| family | queries | sf0.1 | sf1 |")
    print("|---|---|---|---|")
    for name, (cnt, s01, s1) in sorted(fams.items(), key=lambda kv: -kv[1][1]):
        print(f"| {name} | {cnt} | {s01:.1f} | {s1:.1f} |")
    print()
    slow = sorted(q1.items(), key=lambda kv: -kv[1])[:6]
    print("Slowest at sf1: " + ", ".join(f"{k} {v:.1f}" for k, v in slow))


if __name__ == "__main__":
    main()
