#!/usr/bin/env python3
"""Build a NULL-injected copy of a testdata scale dir (dev-side).

The driver's fixtures carry no NULLs in most columns, so ordered-hash
divergences of the NULLS FIRST (Spark asc) vs NULLS LAST (DuckDB asc)
class stay latent until real data hits them (ADVICE round-8 flagged
exactly this on interval_join). This script deterministically NULLs a
few percent of every *semantically nullable* column — event actors and
measures, document metadata, dimension attributes — leaving join keys
and payload columns (text, embedding vectors) intact, so every
registered query can then be swept with Verify + check.py against the
same injected tables:

    python3 tools/null_sweep.py /root/testdata/sf0.001 /tmp/sfnull
    sbt "runMain graft.Verify /tmp/sfnull /tmp/verify_null"
    python3 tools/check.py /tmp/sfnull /tmp/verify_null

A FAIL in that sweep is a genuine cross-engine NULL-semantics
divergence (ordering, grouping, or arithmetic), not a data bug.
"""
import os
import sys

import duckdb

# table -> list of (column, predicate on OTHER columns selecting ~2-3%
# of rows). Moduli are distinct primes so injected columns overlap only
# rarely (compound-null rows still occur, which is the realistic shape).
INJECT = {
    "events": [
        ("user_id", "event_id % 53 = 0"),
        ("value", "event_id % 97 = 0"),
        ("props", "event_id % 101 = 0"),
    ],
    "documents": [
        ("lang", "doc_id % 41 = 0"),
        ("source", "doc_id % 43 = 0"),
    ],
    "customer": [
        ("c_mktsegment", "c_custkey % 37 = 0"),
        ("c_acctbal", "c_custkey % 59 = 0"),
    ],
    "orders": [
        ("o_orderpriority", "o_orderkey % 61 = 0"),
    ],
    "lineitem": [
        ("l_returnflag", "l_orderkey % 71 = 0 AND l_linenumber = 1"),
    ],
    "embeddings": [
        ("label", "vec_id % 31 = 0"),
    ],
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        dst_path = os.path.join(dst, f"{t}.parquet")
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src_path}')").fetchall()]
        injected = {c: p for (c, p) in INJECT.get(t, [])}
        select = ", ".join(
            f"CASE WHEN {injected[c]} THEN NULL ELSE {c} END AS {c}"
            if c in injected else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{src_path}')) "
            f"TO '{dst_path}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_path}')").fetchone()[0]
        marks = ", ".join(
            f"{c}:{con.execute(f'SELECT count(*) FROM read_parquet({dst_path!r}) WHERE {c} IS NULL').fetchone()[0]}"
            for c in injected) or "-"
        print(f"{t}: {n} rows, nulls [{marks}]")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
