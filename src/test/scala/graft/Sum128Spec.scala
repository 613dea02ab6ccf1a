package graft

import org.apache.spark.sql.functions._

/** [[graft.plans.Sum128]] — the two-long exact bigint sum agg_corr's
  * moment accumulators ride (round 17). The contract under test: within
  * its documented bounds (|per-row| ≤ 2⁶², |total| < 2.1·10³⁷) the result
  * is EXACTLY `sum(cast(x as decimal(38,0)))`, for either sign, under
  * partial-aggregation merges, with SQL SUM null semantics. */
class Sum128Spec extends SparkSpec {
  import spark.implicits._

  private def viaDecimal(rows: Seq[(Int, Option[Long])]) =
    rows.toDF("g", "x").repartition(7)
      .groupBy("g").agg(sum(col("x").cast("decimal(38,0)")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getDecimal(1))).toMap

  private def viaSum128(rows: Seq[(Int, Option[Long])]) =
    rows.toDF("g", "x").repartition(7)
      .groupBy("g").agg(graft.plans.sum128(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getDecimal(1))).toMap

  test("sum128 equals decimal sum on mixed-sign values across merges") {
    val rng = new scala.util.Random(17)
    val rows: Seq[(Int, Option[Long])] = (1 to 5000).map { i =>
      // mixed magnitudes up to ~2^61, both signs — every update exercises
      // the carry fold; 7 partitions force real partial-agg merges
      (i % 5, Some((rng.nextLong() >> (rng.nextInt(40) + 2))))
    }
    assert(viaSum128(rows) === viaDecimal(rows))
  }

  test("sum128 carries past the long range (hi > 0) exactly") {
    val big = 1L << 62 // the documented per-row bound itself
    val rows: Seq[(Int, Option[Long])] =
      Seq.fill(64)((0, Some(big))) ++ Seq.fill(3)((1, Some(-big)))
    val got = viaSum128(rows)
    // 64 · 2⁶² = 2⁶⁸ — unrepresentable in a long, exact in the hi/lo pair
    assert(got(0).get === new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(68)))
    assert(got(1).get === new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(62).multiply(
        java.math.BigInteger.valueOf(-3))))
    assert(got === viaDecimal(rows))
  }

  test("sum128 null semantics match SQL SUM") {
    val rows: Seq[(Int, Option[Long])] = Seq(
      (0, None), (0, None),              // all-null group -> NULL
      (1, Some(5L)), (1, None),          // nulls skipped, not zeroed
      (2, Some(-7L)), (2, Some(7L)))     // exact zero, not NULL
    val got = viaSum128(rows)
    assert(got(0) === None)
    assert(got(1).map(_.longValueExact) === Some(5L))
    assert(got(2).map(_.longValueExact) === Some(0L))
    assert(got === viaDecimal(rows))
  }

  test("sum128 rejects non-bigint input at analysis") {
    val e = intercept[Exception] {
      Seq((1, 1.5)).toDF("g", "x").groupBy("g")
        .agg(graft.plans.sum128(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sum128"))
  }
}
