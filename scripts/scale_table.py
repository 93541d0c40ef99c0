#!/usr/bin/env python3
"""Render SCALING.md's results table from SCALING_results.json.

Usage: python3 scripts/scale_table.py [SCALING_results.json ...]

Later files override earlier ones per (n_docs, query) — the documented
merge path for partial re-runs of contended measurements (ScaleBench's
query-filter arg). Prints the markdown table plus a list of rows whose
accepted calibration bracket still exceeds 1.5x the modal baseline, so
contended accepts are visible instead of silently shipping.
"""
import json
import sys
from collections import Counter


def load(paths):
    rows = {}
    commits = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        commits.append(d.get("commit", "unknown")[:12])
        for r in d["results"]:
            rows[(r["n_docs"], r["query"])] = r
    return rows, commits


def main():
    paths = sys.argv[1:] or ["SCALING_results.json"]
    rows, commits = load(paths)
    sizes = sorted({n for n, _ in rows})
    queries = []
    for (_, q) in sorted(rows, key=lambda k: (k[0], list(rows).index(k))):
        if q not in queries:
            queries.append(q)

    # modal calibration = the quiet-host baseline
    cals = [c for r in rows.values() for c in r.get("cal_ms", []) if c]
    base = Counter(round(c / 25) * 25 for c in cals).most_common(1)[0][0]

    hdr = "| query | " + " | ".join(f"{n:,}" for n in sizes) + \
        " | t(max)/t(min-size) | rows at max |"
    sep = "|---" * (len(sizes) + 3) + "|"
    print(hdr)
    print(sep)
    contended = []
    for q in queries:
        cells = []
        secs = {}
        for n in sizes:
            r = rows.get((n, q))
            if r is None:
                cells.append("—")
                continue
            secs[n] = r["sec"]
            cells.append(f"{r['sec']:.2f}")
            if max(r.get("cal_ms", [0])) > base * 1.5:
                contended.append((n, q, r["sec"], r["cal_ms"]))
        ratio = "—"
        if len(secs) >= 2:
            lo, hi = min(secs), max(secs)
            ratio = f"{secs[hi] / secs[lo]:.1f}x"
        last = rows.get((sizes[-1], q)) or rows.get((sizes[-2], q))
        nrows = f"{last['rows']:,}" if last else "—"
        print(f"| {q} | " + " | ".join(cells) + f" | {ratio} | {nrows} |")
    print(f"\ncommits: {', '.join(commits)}; modal calibration ~{base} ms")
    if contended:
        print("\nCONTENDED ACCEPTS (re-measure and merge):")
        for n, q, s, cal in contended:
            print(f"  n={n} {q} sec={s} cal={cal}")


if __name__ == "__main__":
    main()
