#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tooling only; the
shipped library is the Scala code under src/).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each testdata parquet as a DuckDB view
  3. runs every oracle_sql.json query in DuckDB
  4. compares against the Spark parquet dump: schema (column names/dtypes),
     row count, and exact cell values after canonical sort.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # an in-memory connection has no temp dir, so blocking operators can't
    # spill and a big sf1 oracle OOMs instead of going out-of-core
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        # driver testdata = one parquet FILE per table; Inflate scale dirs
        # (sf1/sf10) = a Spark-written DIRECTORY of part files
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Cross-check the dump's own status: a query Verify recorded as FAILED
    # must never score OK off a stale prior-round parquet dir (the
    # placeholder write can itself fail on session-level errors).
    status_path = os.path.join(out_dir, "verify_status.json")
    dump_failed = set()
    if os.path.exists(status_path):
        st = json.load(open(status_path))
        dump_failed = set(st.get("failed", []))
        if st.get("declared") != len(oracle):
            print(f"WARN verify_status declared={st.get('declared')} != oracle entries {len(oracle)}")
    # Optional per-oracle wall-clock budget (ORACLE_TIMEOUT_SEC): some
    # GENERATED oracles (knn/LSH SQL over inflated sf1+ vectors) are
    # hours-slow in DuckDB while the engine side finishes in seconds — a
    # timeout records the oracle as TIMEOUT (listed, not scored) so the
    # rest of the suite still gets checked. Timeouts are an ORACLE-cost
    # statement, never evidence about the Spark result.
    timeout_sec = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0)
    timeouts = []

    def run_oracle(sql):
        if timeout_sec <= 0:
            return con.execute(sql).fetchdf()
        import threading
        fired = threading.Event()

        def _interrupt():
            fired.set()
            con.interrupt()
        t = threading.Timer(timeout_sec, _interrupt)
        t.start()
        try:
            return con.execute(sql).fetchdf()
        except Exception:
            if fired.is_set():
                raise TimeoutError(f"oracle exceeded {timeout_sec:.0f}s")
            raise
        finally:
            t.cancel()
            # Interrupt race (ADVICE r11): the timer can fire AFTER
            # fetchdf() returned but before cancel() — the pending
            # interrupt then poisons the shared connection and the NEXT
            # query raises a spurious FAIL. join() first: cancel() does
            # not stop a callback that already started, so without the
            # join the drain itself can race con.interrupt() (code-review
            # r12) — after join() the callback has either fully run or
            # never will.
            t.join()
            if fired.is_set():
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass

    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if name in dump_failed:
            print(f"FAIL {name}: verify dump recorded failure", flush=True); failures += 1; continue
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir", flush=True); failures += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}", flush=True); failures += 1; continue
        try:
            want = run_oracle(sql)
        except TimeoutError as e:
            print(f"TIMEOUT {name}: {e}", flush=True); timeouts.append(name); continue
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}", flush=True); failures += 1; continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            failures += 1; continue
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
            for c in bad[:2]:
                m = (got[c].astype(object).fillna("\0N") != want[c].astype(object).fillna("\0N")).to_numpy().nonzero()[0][:3]
                for i in m:
                    print(f"   row {i} col {c}: spark={got[c].iloc[i]!r} duck={want[c].iloc[i]!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows", flush=True)
    checked = len(oracle) - len(timeouts)
    if timeouts:
        print(f"\nORACLE TIMEOUTS ({len(timeouts)}, unscored): {', '.join(timeouts)}")
    print(f"\n{checked - failures}/{checked} queries match", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
