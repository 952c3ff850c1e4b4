#!/usr/bin/env python3
"""Merge two full-registry ScaleProbe ledgers into the BASELINE.md table.

Usage:
    sbt "runMain graft.tools.ScaleProbe ALL"   # with SCALE_COPIES=1 SCALE_DOCS=1
    sbt "runMain graft.tools.ScaleProbe ALL"   # with SCALE_COPIES=10 SCALE_DOCS=1
    python3 tools/scale_ledger.py /tmp/graft-scale-ledger-x1-docs.json \
        /tmp/graft-scale-ledger-x10-docs.json > /tmp/ledger_table.md

Emits a markdown table of per-query (t1x, t10x, ratio, spill), sorted
by ratio descending so the super-linear tail reads first. Ratios > 3x
are flagged; every flagged row needs a documented cap/route or a fix.
Sub-second 1x timings are noise-floored (max(t, 0.25s)) for the ratio
so fixed JVM overhead doesn't read as super-linear scaling.
"""
import json
import sys

FLOOR = 0.25


def main(p1: str, p10: str) -> None:
    x1 = json.load(open(p1))
    x10 = json.load(open(p10))
    rows = []
    for name in sorted(set(x1) | set(x10)):
        a, b = x1.get(name), x10.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, None))
            continue
        ratio = b["sec"] / max(a["sec"], FLOOR)
        rows.append((ratio, name, a, b, ratio))
    rows.sort(key=lambda r: -r[0])
    n_flag = sum(1 for r in rows if r[4] is not None and r[4] > 3)
    print(f"| query | t1x (s) | t10x (s) | ratio | spill@10x (MiB) | note |")
    print(f"|---|---|---|---|---|---|")
    for _, name, a, b, ratio in rows:
        if ratio is None:
            print(f"| {name} | {a and a['sec']} | {b and b['sec']} | MISSING | | |")
            continue
        flag = " **>3x**" if ratio > 3 else ""
        print(f"| {name} | {a['sec']:.2f} | {b['sec']:.2f} | "
              f"{ratio:.2f}{flag} | {b['spill_mib']} | |")
    print(f"\n{len(rows)} queries, {n_flag} above 3x", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
