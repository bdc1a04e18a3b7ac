#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already been
run (or run with --run to invoke it). For each query result parquet under
outDir, runs the matching oracle SQL from oracle_sql.json in DuckDB over
views of the sfDir tables, then compares:
  - column name sets (driver sorts columns by name)
  - row counts
  - exact values row-by-row after sorting both frames by all columns

This is a dev tool only — NOT part of the shipped library.
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _nested_cols(df):
    # The driver's comparator sorts by all columns with pandas, which
    # cannot factorize array/struct cells (unhashable numpy arrays) —
    # such a query errors out in the real gate. Mirror that strictly:
    # report nested columns as failures so they get string-encoded in
    # the query itself, never papered over here.
    return [c for c in df.columns
            if df[c].map(lambda v: isinstance(v, (list, tuple, dict))
                         or hasattr(v, "tolist")).any()]


def compare(name, spark_df, oracle_df):
    issues = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return [f"columns differ: spark={sc} oracle={oc}"]
    if len(spark_df) != len(oracle_df):
        issues.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return issues
    nested = sorted(set(_nested_cols(spark_df)) | set(_nested_cols(oracle_df)))
    if nested:
        return [f"nested (array/struct) columns would crash the driver "
                f"comparator: {nested} — string-encode them in the query"]
    s = spark_df[sc].sort_values(by=sc, ignore_index=True)
    o = oracle_df[oc].sort_values(by=oc, ignore_index=True)
    for c in sc:
        sv, ov = s[c].astype(str), o[c].astype(str)
        neq = (sv != ov)
        if neq.any():
            i = int(neq.idxmax())
            issues.append(f"col {c}: {int(neq.sum())} mismatches, first at "
                          f"row {i}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch",
                        f'runMain graft.Verify {sf_dir} {out_dir}'],
                       cwd="/root/repo", check=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        pq = os.path.join(out_dir, name)
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM '{pq}/*.parquet'").df()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else '** EMPTY **'}")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        issues = compare(name, spark_df, oracle_df)
        if issues:
            n_fail += 1
            print(f"  [FAIL] {name}:")
            for i in issues:
                print(f"     - {i}")
        else:
            n_pass += 1
            print(f"  [pass] {name}: {len(spark_df)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
