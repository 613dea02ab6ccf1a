package graft

import org.apache.spark.sql.functions._

/** The correctness-artifact completeness gate (VERDICT r9 #3): a query that
  * THROWS during the verify dump must surface as a red, schema-mismatching
  * entry plus an explicit status record — never as a silently shorter
  * artifact (the r9 failure mode: 7 queries vanished from CORRECTNESS and
  * the report still read all-green). */
class VerifyGateSpec extends SparkSpec {

  test("a deliberately-broken query yields a placeholder output + status entry") {
    val out = java.nio.file.Files.createTempDirectory("verify_gate").toString
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "good_query" -> ((s, _) => s.range(3).toDF("id")),
      "bad_query"  -> ((_, _) => throw new IllegalStateException("synthetic failure")))
    val failed = Verify.dump(spark, sf0001, out, queries)

    assert(failed.map(_._1) === Seq("bad_query"))
    assert(failed.head._2.contains("synthetic failure"))

    // the good query's dump is its real result
    val good = spark.read.parquet(s"$out/good_query")
    assert(good.columns.toSeq === Seq("id") && good.count() === 3)

    // the broken query STILL writes an output, with a schema no oracle can
    // match and the error text as the cell — red, not missing
    val bad = spark.read.parquet(s"$out/bad_query")
    assert(bad.columns.toSeq === Seq("__verify_error"))
    assert(bad.count() === 1)
    assert(bad.select(col("__verify_error")).collect().head.getString(0)
      .contains("synthetic failure"))

    // the status file is self-describing: declared vs succeeded + names
    val status = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/verify_status.json")))
    assert(status.contains(""""declared": 2"""))
    assert(status.contains(""""succeeded": 1"""))
    assert(status.contains(""""bad_query""""))
    assert(status.contains("synthetic failure"))
  }

  test("an all-green dump reports complete status and no placeholders") {
    val out = java.nio.file.Files.createTempDirectory("verify_gate_ok").toString
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q" -> ((s, _) => s.range(2).toDF("id")))
    assert(Verify.dump(spark, sf0001, out, queries).isEmpty)
    val status = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/verify_status.json")))
    assert(status.contains(""""declared": 1""") && status.contains(""""succeeded": 1"""))
    assert(status.contains(""""failed": []"""))
  }
}
