package graft

import graft.operators.TemporalQueries
import org.apache.spark.sql.functions._

/** As-of join, band range join, quantiles: semantics on the sf0.001 tables,
  * checked against independently-computed brute-force references. */
class TemporalSpec extends SparkSpec {

  test("aj_asof_join picks the latest error at-or-before each purchase") {
    val raw = Tables.events(spark, sf0001)
    val ev = raw
      .select(col("event_id"), col("user_id"), Tables.tsUs(raw).as("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val got = TemporalQueries.ajAsof.fn(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length === purchases.size, "one output row per purchase")
    got.foreach { r =>
      val (user, pts) = purchases(r.getLong(0))
      assert(r.getLong(1) === user)
      val eligible = errors.filter { case (u, ts, _) => u == user && ts <= pts }
      if (eligible.isEmpty) {
        assert(r.isNullAt(2) && r.isNullAt(3))
      } else {
        val (_, bts, bid) = eligible.maxBy { case (_, ts, id) => (ts, id) }
        assert(r.getLong(2) === bid, s"purchase ${r.getLong(0)}")
        assert(r.getLong(3) === pts - bts)
      }
    }
  }

  test("aj_asof_native: the custom SparkPlan is row-identical to the union+window form") {
    val key = Seq("event_id", "user_id", "last_err_id", "gap_us")
    def rows(q: QueryDef) = q.fn(spark, sf0001)
      .collect().map(r => key.indices.map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i)))).sortBy(_.toString)
    val native = rows(TemporalQueries.ajAsofNative)
    val composed = rows(TemporalQueries.ajAsof)
    assert(native.nonEmpty && native === composed)
    // and the plan really is the custom operator, not a fallback
    val p = TemporalQueries.ajAsofNative.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"expected the custom exec:\n$p")
  }

  test("AsofJoin: randomized reference incl. ties, dup times, empty/stale keys, string keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // small key space forces every merge-sweep path: repeated probes per
    // key, stale reference keys, keys with no references, ties on time
    val probes = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(12)}", rnd.nextInt(40).toLong))
    val refs = (1 to 200).map(i =>
      (s"k${rnd.nextInt(15)}", rnd.nextInt(40).toLong, 1000L + i))
    val pDf = probes.toDF("pid", "k", "t")
    val rDf = refs.toDF("k", "t", "rid")
      .select(col("k"), col("t"), col("rid"), col("t").as("rt"))
    val got = graft.plans.AsofJoin(pDf, rDf, key = "k", time = "t", tie = "rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val want = probes.map { case (pid, k, t) =>
      val el = refs.filter(x => x._1 == k && x._2 <= t)
      pid -> (if (el.isEmpty) -1L else el.maxBy(x => (x._2, x._3))._3)
    }.toMap
    assert(got === want)
  }

  test("aj_range_join equals the brute-force theta join") {
    val raw = Tables.events(spark, sf0001)
    val ev = raw
      .select(col("event_id"), col("user_id"), Tables.tsUs(raw).as("ts_us"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts_us").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("event_id").as("e_id"), col("ts_us").as("e_ts"))
    val brute = p.join(e, col("user_id") === col("u2") &&
        col("e_ts") <= col("p_ts") && col("p_ts") - col("e_ts") <= 300000000L)
      .select("p_id", "e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val got = TemporalQueries.ajRange.fn(spark, sf0001).collect()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs === brute, "bucketed band join must find exactly the theta-join pairs")
    assert(got.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 300000000L))
  }

  test("agg_quantile: p50/p90 are within the group's value range and ordered") {
    val rows = TemporalQueries.aggQuantile.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p50 = r.getDouble(2); val p90 = r.getDouble(3)
      assert(p50 <= p90, s"median above p90 for ${r.getString(0)}")
    }
  }
}
