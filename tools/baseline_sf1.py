#!/usr/bin/env python3
"""sf1 DuckDB proxy baseline (VERDICT r16 #3; dev tooling only — the
shipped library is the Scala code under src/).

Times the six headline-analogue oracle queries (the declared DuckDB
equivalents of Bench's headline six, from Verify's oracle_sql.json dump)
over an inflated scale dir, the same warm-cache/min-of-N discipline as
BASELINE.md §B. Usage:

  python3 tools/baseline_sf1.py <sfDir> <oracleSqlJson> [samples=3]

Prints a §B2-style markdown table plus the total, for BASELINE.md.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
HEADLINE = ["w1_first_seen_dedup", "x7_json_extract", "j1_score_argmax",
            "q1_agg", "j4_join_chain", "o1_topk"]


def main(sf_dir: str, oracle_json: str, samples: int = 3) -> int:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_sf1_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(oracle_json))
    total = 0.0
    print(f"| Query (oracle analogue) | Value (s) | Rows out |")
    print(f"|---|---|---|")
    for name in HEADLINE:
        sql = oracle[name]
        best, rows = None, 0
        # one untimed warm pass (page cache), then min of `samples`
        rows = len(con.execute(sql).fetchall())
        for _ in range(samples):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        total += best
        print(f"| `{name}` | {best:.3f} | {rows:,} |")
    print(f"| **Total** | **{total:.3f}** | |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3))
