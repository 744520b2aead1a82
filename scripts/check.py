#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads each Spark result parquet under outDir/<name>/ and compares it to
the DuckDB result of oracle_sql.json's SQL over the raw testdata tables,
after sorting columns by name and rows by all columns (like the driver's
hash compare). Exits nonzero on any mismatch.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize int widths so int32 vs int64 doesn't flag (values equal)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "object":
            # duckdb HUGEINT sums arrive as object(Decimal/int)
            try:
                df[c] = pd.to_numeric(df[c], downcast=None)
                if str(df[c].dtype).startswith("int"):
                    df[c] = df[c].astype("int64")
            except (ValueError, TypeError):
                pass
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    result_dirs = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[check] {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            status = "rows-only " + ("PASS" if len(spark_df) > 0 else "FAIL (0 rows)")
            print(f"[check] {name}: {status} ({len(spark_df)} rows)")
            if len(spark_df) > 0: n_pass += 1
            else: n_fail += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[check] {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"[check] {name}: COLUMN MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"[check] {name}: ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}")
            n_fail += 1; continue
        dtype_diff = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
                      if str(s[c].dtype) != str(o[c].dtype)]
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            note = f" [dtype diffs: {dtype_diff}]" if dtype_diff else ""
            print(f"[check] {name}: PASS ({len(s)} rows){note}")
            n_pass += 1
        except AssertionError as e:
            print(f"[check] {name}: VALUE MISMATCH ({len(s)} rows)")
            msg = str(e).split("\n")
            print("   " + "\n   ".join(msg[:12]))
            # show first differing rows
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"   first bad row {i}:\n   spark : {s.loc[i].to_dict()}\n   oracle: {o.loc[i].to_dict()}")
            n_fail += 1
    print(f"[check] {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
