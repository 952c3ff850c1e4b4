#!/usr/bin/env python3
"""Build an extreme-value copy of a testdata scale dir (dev-side).

The companion of null_sweep.py for the VALUE axis: real 100 TB corpora
contain credit-memo negatives, zero amounts, empty and one-word
documents, far-future timestamps, and zero embedding vectors (failed
encoders). The fixtures contain none of these, so divergences in
rounding of negatives, division-by-zero guards, cosine-of-zero-vector,
and empty-token arithmetic stay latent. This script deterministically
rewrites a few percent of rows to those shapes; sweep with:

    python3 tools/edge_sweep.py /root/testdata/sf0.001 /tmp/sfedge
    sbt "runMain graft.Verify /tmp/sfedge /tmp/verify_edge"
    python3 tools/check.py /tmp/sfedge /tmp/verify_edge
"""
import os
import sys

import duckdb

# table -> list of (column, replacement SQL expr, row predicate)
FUTURE_US = 4070908800000000  # 2099-01-01 in epoch micros
INJECT = {
    "events": [
        ("value", "-value", "event_id % 89 = 0"),
        ("value", "0.0", "event_id % 103 = 0"),
        ("ts", f"make_timestamp({FUTURE_US})", "event_id % 211 = 0"),
    ],
    "documents": [
        ("text", "''", "doc_id % 113 = 0"),
        ("text", "'word'", "doc_id % 127 = 0"),
    ],
    "orders": [
        ("o_totalprice", "-o_totalprice", "o_orderkey % 131 = 0"),
        ("o_totalprice", "0.0", "o_orderkey % 137 = 0"),
    ],
    "lineitem": [
        ("l_quantity", "0.0", "l_orderkey % 149 = 0 AND l_linenumber = 1"),
        ("l_extendedprice", "-l_extendedprice",
         "l_orderkey % 151 = 0 AND l_linenumber = 1"),
    ],
    "embeddings": [
        ("embedding",
         "list_transform(embedding, x -> CAST(0.0 AS FLOAT))",
         "vec_id % 97 = 0"),
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
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src_path}')").fetchall()
        cols = [r[0] for r in desc]
        types = {r[0]: r[1] for r in desc}
        rules = INJECT.get(t, [])
        exprs = []
        for c in cols:
            e = c
            for (rc, repl, pred) in rules:
                if rc == c:
                    e = f"CASE WHEN {pred} THEN {repl} ELSE {e} END"
            # keep the physical type stable under CASE widening
            exprs.append(f"CAST({e} AS {types[c]}) AS {c}" if e != c else c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM read_parquet('{src_path}')) "
            f"TO '{dst_path}' (FORMAT PARQUET)")
        marks = []
        for (rc, repl, pred) in rules:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{src_path}') WHERE {pred}"
            ).fetchone()[0]
            marks.append(f"{rc}<-{repl[:18]}:{n}")
        total = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_path}')").fetchone()[0]
        print(f"{t}: {total} rows, edits [{', '.join(marks) or '-'}]")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
