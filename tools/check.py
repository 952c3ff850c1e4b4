#!/usr/bin/env python3
"""Dev-only driver mimic: compare graft.Verify parquet dumps against the
DuckDB oracle SQL. Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df

def kind(series):
    """Canonical dtype kind for driver-equivalent strictness: the driver
    hashes rendered values, so int 1 vs float 1.0 must NOT compare equal
    here. Width differences (int32 vs int64) are benign; numeric *class*
    differences (int vs float vs Decimal) are not."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    # object column: classify over ALL non-null values — first-value
    # classing hides a mixed int/float column whose later rows would
    # hash-differ under the driver's rendered-value compare
    nn = series.dropna()
    if len(nn) == 0:
        return "empty"
    import decimal
    import numpy as np
    def vclass(v):
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "map"
        return type(v).__name__
    kinds = {vclass(v) for v in nn}
    if len(kinds) == 1:
        return kinds.pop()
    return "mixed:" + "+".join(sorted(kinds))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_df = load_spark(out_dir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        # exact value compare, in result order (queries enforce total order)
        mismatch = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            sk, dk = kind(sv), kind(dv)
            if sk != dk and "empty" not in (sk, dk):
                mismatch.append(f"col {c} dtype: spark={sk}({sv.dtype}) "
                                f"duck={dk}({dv.dtype})")
                continue
            try:
                # null-aware: pandas `==` treats None/NaN as never-equal
                eq = (sv.isna() & dv.isna()) | (sv.astype(object) == dv.astype(object))
            except Exception:
                eq = pd.Series([False] * len(s))
            bad = (~eq)
            if bad.any():
                i = bad.idxmax()
                mismatch.append(f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r} "
                                f"({int(bad.sum())} rows differ)")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    # rows-only queries (no oracle): check output exists and >0 rows
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        df = load_spark(out_dir, name)
        if df is None or len(df) == 0:
            print(f"WARN {name}: rows-only query has empty output")
        else:
            print(f"OK   {name} (rows-only, {len(df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
