package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Plan-level checks for the scale utilities. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    // skewed large side: 90% of rows share key 1
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1, s"v$i")).toDF("k", "v")
    val small = (0 to 6).map(i => (i, s"dim$i")).toDF("k", "d")
    val plain = large.join(small, Seq("k"))
    val salted = Scale.saltedJoin(large, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Scale.writeBucketed(l, "b_lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
