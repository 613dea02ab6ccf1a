#!/usr/bin/env python3
"""Isolated single-oracle slot (dev tooling): re-run ONE query's DuckDB
oracle with no timeout and compare against an existing Verify dump — the
recovery path for oracles whose shared-sweep slot was starved (r14/r15:
sim_dedup_index's recursive SemDeDup+knn CTE at sf1 needs a quiet box and
more than the shared ORACLE_TIMEOUT_SEC budget). Compare semantics are
oracle_check.py's exactly (canonical sort, exact cells, exact floats).

Usage: python3 tools/oracle_single.py <sfDir> <outDir> <queryName>
Exit 0 = match; prints the same OK/FAIL line as oracle_check.py.
"""
import json, os, sys
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, name: str) -> int:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if name not in oracle:
        print(f"FAIL {name}: not in oracle_sql.json"); return 1
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output dir"); return 1
    got = con.execute(
        f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
    want = con.execute(oracle[name]).fetchdf()
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(want.columns)}")
        return 1
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}"); return 1
    bad = []
    for c in got.columns:
        a, b = got[c].values, want[c].values
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = np.array_equal(a.astype("float64"), b.astype("float64"), equal_nan=True)
        else:
            eq = (pd.Series(a).astype(object).fillna("\0N") ==
                  pd.Series(b).astype(object).fillna("\0N")).all()
        if not eq:
            bad.append(c)
    if bad:
        print(f"FAIL {name}: value mismatch in columns {bad}")
        return 1
    print(f"OK   {name}: {len(got)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
