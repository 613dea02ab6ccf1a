#!/usr/bin/env python3
"""sf1 DuckDB proxy baseline (VERDICT r16 #3; dev tooling only — the
shipped library is the Scala code under src/).

Times the six headline-analogue oracle queries (the declared DuckDB
equivalents of Bench's headline six, from Verify's oracle_sql.json dump)
over an inflated scale dir, the same warm-cache/min-of-N discipline as
BASELINE.md §B — plus, round 17, the sim/dd/ta FAMILY oracles (BASELINE
§B3): the same declarative computation both engines receive, run under a
per-query interrupt budget so one pathological plan cannot stall the
sweep (an interrupted query reports as a `>budget` lower bound).

  python3 tools/baseline_sf1.py <sfDir> <oracleSqlJson> [samples=3] [budget_s=120]

Prints §B2/§B3-style markdown tables plus totals, for BASELINE.md.
"""
import json, os, sys, threading, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
HEADLINE = ["w1_first_seen_dedup", "x7_json_extract", "j1_score_argmax",
            "q1_agg", "j4_join_chain", "o1_topk"]
# Bench's sf1 family block, minus the headline six (already in §B2).
FAMILY = ["sim_ivf_pq", "sim_ivf_pq_incremental", "sim_dedup_index",
          "sim_pq_recall", "dd_lsh_buckets", "dd_fuzzy_keep",
          "dd_dup_clusters", "dd_span_scrub",
          "ta_bigram_lm", "ta_bpe_merge2", "ta_rarity", "ta_corpus_shuffle"]


def timed(con, sql, budget_s):
    """(seconds, rows) or (None, None) when the budget interrupted it."""
    done = [False]

    def kill():
        if not done[0]:
            con.interrupt()

    timer = threading.Timer(budget_s, kill)
    timer.start()
    t0 = time.time()
    try:
        rows = len(con.execute(sql).fetchall())
        return time.time() - t0, rows
    except duckdb.InterruptException:
        return None, None
    finally:
        done[0] = True
        timer.cancel()
        # cancel() does not wait for an in-flight callback: join the timer
        # thread so kill() cannot interrupt AFTER the absorber below, then
        # absorb any interrupt that fired in the window between execute()
        # returning and done being set — a pending interrupt on the shared
        # connection would otherwise kill the NEXT query instantly and
        # misreport a fast query as '>budget'
        timer.join()
        try:
            con.execute("SELECT 1")
        except duckdb.InterruptException:
            pass


def sweep(con, oracle, names, samples, budget_s):
    total, lower_bound = 0.0, False
    print("| Query (oracle analogue) | Value (s) | Rows out |")
    print("|---|---|---|")
    for name in names:
        sql = oracle[name]
        # one untimed-for-min warm pass (page cache); it still counts
        # against the budget check so a >budget query runs ONCE, not 1+N
        dt0, rows = timed(con, sql, budget_s)
        if dt0 is None:
            print(f"| `{name}` | >{budget_s} (interrupted) | — |")
            total += budget_s
            lower_bound = True
            continue
        best = dt0
        for _ in range(samples):
            dt, _ = timed(con, sql, budget_s)
            if dt is not None:
                best = min(best, dt)
        total += best
        print(f"| `{name}` | {best:.3f} | {rows:,} |")
    bound = ">" if lower_bound else ""
    print(f"| **Total** | **{bound}{total:.3f}** | |")
    return total


def main(sf_dir, oracle_json, samples=3, budget_s=120):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_sf1_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(oracle_json))
    print("## headline six (§B2)")
    sweep(con, oracle, HEADLINE, samples, budget_s)
    print("\n## sim/dd/ta family (§B3)")
    sweep(con, oracle, FAMILY, samples, budget_s)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 120))
