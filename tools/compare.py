#!/usr/bin/env python3
"""Local oracle-parity harness (mirrors the driver's correctness gate).

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf_dir tables;
compares schema (column names sorted), row count, and values
(columns sorted by name, exact match after per-cell normalization).
Purely a dev tool — NOT part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(path):
    # sorted: glob order is filesystem-dependent; the positional compare
    # below relies on a stable file order if a result ever has >1 part.
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    con = duckdb.connect()
    return con.sql(f"SELECT * FROM read_parquet({files!r})").df()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_df = load_spark(os.path.join(out_dir, name))
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, duck_df)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def compare(a, b):
    ca, cb = sorted(a.columns), sorted(b.columns)
    if ca != cb:
        return False, f"columns differ: spark={ca} duck={cb}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} duck={len(b)}"
    a, b = a[ca], b[cb]
    for c in ca:
        da, db = a[c].dtype, b[c].dtype
        if da != db:
            # ns vs us timestamps are fine; anything else flag loudly
            if "datetime64" in str(da) and "datetime64" in str(db):
                pass
            else:
                return False, f"dtype differ on {c}: spark={da} duck={db}"
    for c in ca:
        va, vb = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating):
            same = np.isclose(va.astype(float), vb.astype(float),
                              rtol=0, atol=1e-9, equal_nan=True)
        elif "datetime64" in str(a[c].dtype):
            xa = a[c].astype("datetime64[us]").values
            xb = b[c].astype("datetime64[us]").values
            same = (xa == xb) | (pd.isna(xa) & pd.isna(xb))
        else:
            same = (pd.isna(va) & pd.isna(vb)) | (va == vb)
        if not np.all(same):
            i = int(np.argmin(same))
            return False, (f"value mismatch col={c} row={i}: "
                           f"spark={va[i]!r} duck={vb[i]!r}")
    return True, ""

if __name__ == "__main__":
    main()
