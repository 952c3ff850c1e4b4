#!/usr/bin/env python3
"""Build a duplication-injected copy of a testdata scale dir (dev-side).

The companion of null/edge/unicode_sweep for the DUPLICATION axis: the
synthetic fixtures contain almost no real near-duplicates, so the
dedup-tier oracles (minhash/simhash/jaccard pairs, CC clusters,
keep-best, pair quality, source matrix, kNN votes) are exercised mostly
on sparse-dup data where the candidate/verify paths barely fire. Real
corpora are the opposite. This script APPENDS deterministic duplicate
families — for ~4% of documents an exact copy, a suffix near-copy and a
prefix near-copy; for ~3% of embeddings an exact copy and an
epsilon-perturbed copy — with new ids offset by millions so every
id-arithmetic convention (query sets, split hashes, parity) is
untouched for the original rows. Sweep with:

    python3 tools/dup_sweep.py /root/testdata/sf0.001 /tmp/sfdup
    sbt "runMain graft.Verify /tmp/sfdup /tmp/verify_dup"
    python3 tools/check.py /tmp/sfdup /tmp/verify_dup
"""
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DOC_SEED = "doc_id % 23 = 0"
VEC_SEED = "vec_id % 29 = 0"


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        dst_path = os.path.join(dst, f"{t}.parquet")
        base = f"read_parquet('{src_path}')"
        if t == "documents":
            q = f"""
            SELECT * FROM {base}
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text,
                   lang, source, n_chars
            FROM {base} WHERE {DOC_SEED}
            UNION ALL
            SELECT doc_id + 2000000 AS doc_id, text || ' extracopy' AS text,
                   lang, source, CAST(length(text || ' extracopy') AS BIGINT) AS n_chars
            FROM {base} WHERE {DOC_SEED}
            UNION ALL
            SELECT doc_id + 3000000 AS doc_id, 'dupmark ' || text AS text,
                   lang, source, CAST(length('dupmark ' || text) AS BIGINT) AS n_chars
            FROM {base} WHERE {DOC_SEED}
            """
        elif t == "embeddings":
            q = f"""
            SELECT * FROM {base}
            UNION ALL
            SELECT vec_id + 1000000 AS vec_id, embedding, label
            FROM {base} WHERE {VEC_SEED}
            UNION ALL
            SELECT vec_id + 2000000 AS vec_id,
                   list_transform(embedding, x -> CAST(x + 0.001 AS FLOAT)) AS embedding,
                   label
            FROM {base} WHERE {VEC_SEED}
            """
        else:
            q = f"SELECT * FROM {base}"
        con.execute(f"COPY ({q}) TO '{dst_path}' (FORMAT PARQUET)")
        n0 = con.execute(f"SELECT count(*) FROM {base}").fetchone()[0]
        n1 = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_path}')").fetchone()[0]
        extra = f" (+{n1 - n0} injected dups)" if n1 != n0 else ""
        print(f"{t}: {n1} rows{extra}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
