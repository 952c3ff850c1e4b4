#!/usr/bin/env python3
"""Round-over-round per-query bench regression diff.

Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [--factor 2.0] [--floor 0.5]
    python3 tools/bench_diff.py --selftest

Each input is a graft.Bench output line: {"metric":"total","value":N,
"queries":{name:sec,...},...}. A query REGRESSES when new >= factor*old
AND new-old >= floor seconds (the floor suppresses sub-second codegen
jitter; the suite's documented run variance is +-10% with a roving
single-query GC outlier of +5-8s, so one flagged query is a signal to
re-run, two+ are a real regression). Exit code: 0 clean, 1 regressions,
2 usage error. Queries present on only one side are reported but never
fail the diff (coverage intentionally grows between rounds).
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # tolerate an sbt "[info] " prefix on the JSON line
    obj = None
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("{"):
            obj = json.loads(txt if txt.lstrip().startswith("{\n") else line)
            break
    if obj is None:
        raise ValueError(f"no JSON object line in {path}")
    if "queries" in obj:
        return obj
    # driver wrapper format: {"n":..,"tail":"...","parsed":...} — the
    # bench line may be truncated at the head, so salvage whatever
    # "name":sec pairs survive in the tail (a partial old side only
    # weakens the diff, it doesn't break it)
    if obj.get("parsed"):
        return obj["parsed"]
    import re
    pairs = re.findall(r'\\?"([a-z0-9_]+)\\?":([0-9]+\.[0-9]+)',
                       obj.get("tail", ""))
    qs = {k: float(v) for k, v in pairs if k not in ("value",)}
    if not qs:
        raise ValueError(f"no per-query times found in {path}")
    return {"queries": qs}


# Queries sharing a JVM-memoized trainer (the Lloyd k-means centroids /
# PQ codebooks in Similarity.scala): WHICH member pays the one-time
# training cost depends on cache state at run start (e.g. whether the
# stored-index disk cache is valid, letting the stored variant skip its
# build), so individual times legitimately flip between members run to
# run while the group's combined cost is unchanged. Gate these on the
# GROUP SUM instead of per-query — a real plan regression still moves
# the sum; an attribution flip does not.
SHARED_COST_GROUPS = {
    "trainer": {"embedding_kmeans", "ann_ivf_trained", "ann_ivf_stored",
                "ann_pq", "ann_pq_stored", "ann_recall", "semantic_dedup"},
}


def diff(old, new, factor=2.0, floor=0.5):
    """Return (regressions, improvements, added, removed); each entry is
    (name, old_sec, new_sec). Members of a SHARED_COST_GROUPS entry are
    gated on the group's summed time (reported as "group:NAME")."""
    oq, nq = old["queries"], new["queries"]
    grouped = set()
    regress, improve = [], []
    for gname, members in sorted(SHARED_COST_GROUPS.items()):
        both = members & set(oq) & set(nq)
        if len(both) < 2:
            continue  # fall through to per-query gating below
        grouped |= both
        o = sum(oq[m] for m in both)
        n = sum(nq[m] for m in both)
        if n >= factor * o and n - o >= floor:
            regress.append((f"group:{gname}", o, n))
        elif o >= factor * n and o - n >= floor:
            improve.append((f"group:{gname}", o, n))
    for name in sorted(set(oq) & set(nq) - grouped):
        o, n = oq[name], nq[name]
        if n >= factor * o and n - o >= floor:
            regress.append((name, o, n))
        elif o >= factor * n and o - n >= floor:
            improve.append((name, o, n))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    return regress, improve, added, removed


def selftest():
    old = {"queries": {"a": 1.0, "b": 0.1, "c": 4.0, "gone": 1.0}}
    new = {"queries": {"a": 2.6, "b": 0.3, "c": 1.5, "fresh": 9.9}}
    r, i, add, rm = diff(old, new)
    assert r == [("a", 1.0, 2.6)], r          # 2.6x and +1.6s -> regression
    assert i == [("c", 4.0, 1.5)], i          # 2.7x faster -> improvement
    # b tripled but +0.2s is under the floor -> jitter, not a regression
    assert add == ["fresh"] and rm == ["gone"]
    # shared-cost group: an attribution flip (member 4x slower, another
    # member absorbs it) is NOT a regression — the sum barely moves
    old_g = {"queries": {"ann_ivf_trained": 0.9, "ann_ivf_stored": 3.1}}
    new_g = {"queries": {"ann_ivf_trained": 3.4, "ann_ivf_stored": 1.0}}
    r, i, _, _ = diff(old_g, new_g)
    assert r == [] and i == [], (r, i)
    # ...but a real regression across the whole group still fails
    new_g2 = {"queries": {"ann_ivf_trained": 6.0, "ann_ivf_stored": 6.2}}
    r, _, _, _ = diff(old_g, new_g2)
    assert r == [("group:trainer", 4.0, 12.2)], r
    # a group with only one member present falls back to per-query gating
    old_s = {"queries": {"ann_pq": 1.0}}
    new_s = {"queries": {"ann_pq": 3.0}}
    r, _, _, _ = diff(old_s, new_s)
    assert r == [("ann_pq", 1.0, 3.0)], r
    print("selftest ok")


def merge_min(out_path, paths):
    """Per-query min across same-commit runs -> one artifact. The suite's
    run variance is a roving single-query GC outlier (+1-2s on a
    different query each run); the min over 2+ runs removes it without
    loosening the regression gate."""
    runs = [load(p) for p in paths]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    qs = {n: min(r["queries"][n] for r in runs if n in r["queries"])
          for n in sorted(names)}
    art = {"metric": "total", "value": sum(qs.values()), "unit": "sec",
           "queries": qs, "merged_min_of": len(runs),
           "sf": runs[-1].get("sf")}
    with open(out_path, "w") as f:
        json.dump(art, f)
    print(f"wrote {out_path}: {art['value']:.1f}s over {len(qs)} queries "
          f"(min of {len(runs)} runs)")


def main(argv):
    if "--selftest" in argv:
        selftest()
        return 0
    if argv and argv[0] == "--merge-min":
        if len(argv) < 4:
            print("usage: bench_diff.py --merge-min OUT.json RUN1.json RUN2.json...",
                  file=sys.stderr)
            return 2
        merge_min(argv[1], argv[2:])
        return 0
    args = [a for a in argv if not a.startswith("--")]
    opts = {a.split("=")[0]: a for a in argv if a.startswith("--")}

    def opt(name, default):
        raw = opts.get(name)
        return float(raw.split("=")[1]) if raw and "=" in raw else default

    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    factor, floor = opt("--factor", 2.0), opt("--floor", 0.5)
    old, new = load(args[0]), load(args[1])
    regress, improve, added, removed = diff(old, new, factor, floor)
    ot, nt = old.get("value"), new.get("value")
    if ot is not None and nt is not None:
        print(f"total: {ot:.1f}s -> {nt:.1f}s ({nt / ot - 1:+.1%} vs old)")
    for name, o, n in regress:
        print(f"REGRESS {name}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)")
    for name, o, n in improve:
        print(f"improve {name}: {o:.2f}s -> {n:.2f}s")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if not regress:
        print("no per-query regressions "
              f"(factor {factor}x AND +{floor}s floor)")
    return 1 if regress else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
