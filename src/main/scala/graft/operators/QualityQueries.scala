package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data-quality / validation operators — the monitoring half of a
  * training-data pipeline: schema-level column profiling and
  * distribution-drift detection. Neither exists in the reference (its
  * validation is ad-hoc per-field checks); both are table stakes for a
  * pipeline that re-ingests continuously at 100 TB.
  */
object QualityQueries {

  /** Column profile of the lineitem fact table: per profiled column, row
    * count, null count, EXACT distinct count, and (for the numeric
    * columns) min/max in integer cents.
    *
    * The scale-defining choice: one narrow column-pruned aggregation PER
    * COLUMN, unioned — never several `countDistinct`s in one `agg`. The
    * approx_stats round-11 lesson (PLANS.md): Spark's distinct-rewrite
    * expands one row per (group, distinct-key) and every expanded row
    * pays the full partial-merge buffer — the profiler shape that blows
    * up first on wide tables. Separate per-column aggregates keep each
    * scan pruned to one column (vectorized parquet reads nothing else)
    * and each shuffle vocabulary-sized; at 100 TB the exact distincts
    * swap to approx_count_distinct per column with the union unchanged
    * (approx_stats demonstrates the adjudication pattern for that). */
  val qaSchemaProfile = QueryDef("qa_schema_profile",
    """SELECT 'l_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
      |  CAST(NULL AS BIGINT) AS min_cents, CAST(NULL AS BIGINT) AS max_cents
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT), NULL, NULL
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
      |  CAST(MIN(round(l_quantity * 100)) AS BIGINT),
      |  CAST(MAX(round(l_quantity * 100)) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
      |  CAST(MIN(round(l_extendedprice * 100)) AS BIGINT),
      |  CAST(MAX(round(l_extendedprice * 100)) AS BIGINT)
      |FROM lineitem""".stripMargin) { (spark, d) =>
    val li = Tables.lineitem(spark, d)
    def profile(c: String, cents: Boolean) = {
      val base = li.select(col(c))
      val aggs = Seq(
        count(lit(1)).cast("long").as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as("n_null"),
        countDistinct(col(c)).cast("long").as("n_distinct")) ++ (
        if (cents) Seq(
          min(round(col(c) * 100)).cast("long").as("min_cents"),
          max(round(col(c) * 100)).cast("long").as("max_cents"))
        else Seq(lit(null).cast("long").as("min_cents"),
          lit(null).cast("long").as("max_cents")))
      base.agg(aggs.head, aggs.tail: _*).select(lit(c).as("col"), col("n"),
        col("n_null"), col("n_distinct"), col("min_cents"), col("max_cents"))
    }
    profile("l_orderkey", cents = false)
      .union(profile("l_returnflag", cents = false))
      .union(profile("l_quantity", cents = true))
      .union(profile("l_extendedprice", cents = true))
  }

  /** Distribution drift per event type: total-variation distance (in
    * integer ppm) between the value-bucket distributions of two
    * deterministic time slices (even vs odd event days). TV = half the
    * L1 distance between the two normalized histograms — the drift
    * monitor a continuous-ingest pipeline alarms on, stated without logs
    * or doubles: tv_ppm = Σ|c_a·N_b − c_b·N_a| · 10^6 div (2·N_a·N_b),
    * accumulated in DECIMAL(38,0)/HUGEINT per the overflow ceiling.
    *
    * Scale shape: one partial-agg'd groupBy over (type, bucket, slice) —
    * the only corpus-sized stage — then vocabulary-sized pivots, totals
    * DERIVED from the bucket counts, and a broadcast join back. Empty
    * slices yield no row for the type (both totals must be positive for
    * TV to be defined), deterministically on both engines. */
  val qaTvDrift = QueryDef("qa_tv_drift",
    """WITH t AS (SELECT event_type,
      |    (epoch_us(ts) // 86400000000) % 2 = 0 AS slice_a,
      |    CAST(round(value * 100) AS BIGINT) // 1000 AS bucket
      |  FROM events),
      |b AS (SELECT event_type, bucket,
      |    SUM(CASE WHEN slice_a THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN slice_a THEN 0 ELSE 1 END) AS cb
      |  FROM t GROUP BY 1, 2),
      |n AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM b GROUP BY 1)
      |SELECT b.event_type AS event_type,
      |  CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
      |  CAST(SUM(abs(CAST(b.ca AS HUGEINT)*n.nb - CAST(b.cb AS HUGEINT)*n.na))
      |    * 1000000 // (2 * CAST(n.na AS HUGEINT) * n.nb) AS BIGINT) AS tv_ppm
      |FROM b JOIN n ON n.event_type = b.event_type
      |WHERE n.na > 0 AND n.nb > 0
      |GROUP BY b.event_type, n.na, n.nb""".stripMargin) { (spark, d) =>
    val raw = Tables.events(spark, d)
    val t = raw
      .select(col("event_type"), Tables.tsUs(raw).as("ts_us"), col("value"))
      .select(col("event_type"),
        (expr("ts_us div 86400000000") % 2 === 0).as("slice_a"),
        expr("cast(round(value * 100) as bigint) div 1000").as("bucket"))
    val b = t.groupBy("event_type", "bucket")
      .agg(sum(when(col("slice_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("slice_a"), 0L).otherwise(1L)).as("cb"))
    val n = b.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
      .filter(col("na") > 0 && col("nb") > 0)
    b.join(broadcast(n), "event_type")
      .groupBy("event_type", "na", "nb")
      .agg(expr(
        """sum(abs(cast(ca as decimal(38,0)) * nb - cast(cb as decimal(38,0)) * na))
          | * 1000000 div (2 * cast(na as decimal(38,0)) * nb)""".stripMargin)
        .cast("long").as("tv_ppm"))
      .select(col("event_type"), col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"), col("tv_ppm"))
  }

  val all: Seq[QueryDef] = Seq(qaSchemaProfile, qaTvDrift)
}
