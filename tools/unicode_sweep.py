#!/usr/bin/env python3
"""Build a Unicode-stressed copy of a testdata scale dir (dev-side).

The third sweep axis after null_sweep.py (NULL semantics) and
edge_sweep.py (extreme values): a real multilingual corpus carries
CJK text, emoji (astral-plane code points), combining accents, RTL
scripts, and non-breaking spaces. Cross-engine hazards: character
counting (code points vs code units vs graphemes), regex engines
(Java util.regex in Spark vs RE2-style in DuckDB) over \\w/\\d and
Unicode classes, md5 over UTF-8 bytes, and whitespace splitting.
Deterministically append/replace text in a few percent of documents
and event props, then sweep:

    python3 tools/unicode_sweep.py /root/testdata/sf0.001 /tmp/sfuni
    sbt "runMain graft.Verify /tmp/sfuni /tmp/verify_uni"
    python3 tools/check.py /tmp/sfuni /tmp/verify_uni
"""
import os
import sys

import duckdb

# Snippets are appended as extra whitespace-separated tokens so the
# shingle/token machinery sees them; each exercises one hazard class.
SNIPPETS = {
    "cjk": "深度 学習 モデル 데이터 처리",
    "emoji": "🚀 🧪🔬 café👍 naïve",
    "combining": "résumé über Zürich",
    "rtl": "مرحبا بالعالم שלום עולם",
    # real U+00A0 / U+2009 / U+2003 inside one "token": split(' ') must
    # NOT break on them, on either engine
    "nbsp_mixed": "nb\u00a0sp thin\u2009space em\u2003quad",
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
        if t == "documents":
            # doc_id % 31 == k selects which snippet a doc receives
            arms = " ".join(
                f"WHEN doc_id % 31 = {i} THEN text || ' ' || '{snip}'"
                for i, snip in enumerate(SNIPPETS.values()))
            sel = (f"* REPLACE (CASE {arms} ELSE text END AS text)")
        elif t == "events":
            # unicode inside the props JSON string values
            sel = ("* REPLACE (CASE WHEN event_id % 47 = 0 THEN "
                   "regexp_replace(props, '\"v\":', '\"vé\":') "
                   "ELSE props END AS props)")
        else:
            sel = "*"
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src_path}')) "
            f"TO '{dst_path}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_path}')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
