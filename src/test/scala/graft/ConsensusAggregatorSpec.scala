package graft

import graft.functions.{ConsensusYear, MethodYear}
import graft.operators.FoundedYear
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The typed Aggregator must agree with the relational consensus on both
  * hand-built edges and generated candidate tables. */
class ConsensusAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def viaAggregator(rows: Seq[(String, String, Int)]): Map[String, Option[Int]] =
    rows.map { case (w, m, y) => (w, MethodYear(m, y)) }
      .toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(ConsensusYear.toColumn.name("consensus"))
      .collect().toMap

  private def viaRelational(rows: Seq[(String, String, Int)]): Map[String, Option[Int]] =
    FoundedYear.consensus(rows.toDF("website", "method", "year").distinct())
      .collect().map(r => r.getString(0) -> Some(r.getInt(1))).toMap

  test("hand-built edges: full agreement, partial overlap, disjoint sets") {
    val rows = Seq(
      ("a", "jsonld", 1999), ("a", "homepage", 1999), ("a", "google", 1999),
      ("b", "jsonld", 1980), ("b", "jsonld", 1990),
      ("b", "homepage", 1990), ("b", "homepage", 2001),   // ∩ = {1990}
      ("c", "jsonld", 1970), ("c", "homepage", 1984))     // disjoint -> None
    val got = viaAggregator(rows)
    assert(got("a").contains(1999))
    assert(got("b").contains(1990))
    assert(got("c").isEmpty)
  }

  test("single-method key: its own set is the intersection (founded_year.py:212-213)") {
    val got = viaAggregator(Seq(("solo", "google", 2011), ("solo", "google", 2005)))
    assert(got("solo").contains(2005))
  }

  test("registerable as a SQL UDAF via functions.udaf") {
    spark.udf.register("consensus_year", org.apache.spark.sql.functions.udaf(ConsensusYear))
    Seq(("a", "jsonld", 1999), ("a", "homepage", 1999), ("a", "homepage", 2004))
      .toDF("website", "method", "year").createOrReplaceTempView("cons_t")
    val got = spark.sql(
      "SELECT website, consensus_year(method, year) AS c FROM cons_t GROUP BY website")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got("a").contains(1999))
  }

  test("agrees with the relational consensus on generated tables") {
    val rowGen: Gen[(String, String, Int)] = for {
      site <- Gen.choose(1, 15).map(i => s"w$i")
      method <- Gen.oneOf("jsonld", "relevant", "homepage", "google")
      year <- Gen.choose(1995, 2005)
    } yield (site, method, year)
    val rows = (0 until 500)
      .flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val typed = viaAggregator(rows)
    val rel = viaRelational(rows)
    // relational form omits keys with empty intersection; typed returns None
    typed.foreach { case (w, res) =>
      assert(rel.get(w).flatten === res, s"website $w")
    }
    assert(rel.keySet === typed.filter(_._2.nonEmpty).keySet)
  }
}
