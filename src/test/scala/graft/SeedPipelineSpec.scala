package graft

import graft.operators.SeedPipeline
import org.apache.spark.sql.functions._

/** Golden-fixture parity: replay the reference's one trusted end-to-end
  * pipeline (README.md:16) over its real crawl logs and compare against the
  * checked-in golden CSVs (BASELINE.md §C).
  */
class SeedPipelineSpec extends SparkSpec {
  private val logsDir = "/root/reference/logs"
  private val goldenCsv = "/root/reference/output/PE_firms.csv"
  private val goldenDetailed = "/root/reference/output/detailed_PE.csv"

  test("seed query reproduces the golden 28 PE firms") {
    val firms = SeedPipeline.seedProjection(
      SeedPipeline.peFirms(SeedPipeline.readLogs(spark, logsDir)))
    val got = firms.collect().map(r => (r.getString(0), r.getString(1))).toSet

    val want = spark.read.option("header", "true").csv(goldenCsv)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    assert(want.size == 28)
    assert(got == want)
  }

  test("detailed 7-column projection matches golden detailed_PE.csv names") {
    val det = SeedPipeline.detailedProjection(
      SeedPipeline.peFirms(SeedPipeline.readLogs(spark, logsDir)))
    assert(det.columns.toSeq == Seq("FullName", "Website", "Phone", "Email",
      "Latitude", "Longitude", "LongLatAddress"))
    val gotNames = det.select("FullName").collect().map(_.getString(0)).toSet
    // golden CSV has quoted multi-line address fields -> multiLine parse
    val wantNames = spark.read.option("header", "true")
      .option("multiLine", "true").csv(goldenDetailed)
      .select("FullName").collect().map(_.getString(0)).toSet
    assert(gotNames == wantNames)
  }

  test("member explode keeps all PE+Australia records before dedup") {
    val m = SeedPipeline.members(SeedPipeline.readLogs(spark, logsDir))
    // 390 member records in the 4-session corpus (BASELINE.md §A)
    assert(m.count() == 390)
    val pe = m.filter(col("`filter-Member Type`").isin("PE", "private equity") &&
      col("LongLatAddress").contains("Australia"))
    // duplicates across pan events collapse to the golden 28
    assert(pe.select("FullName").distinct().count() == 28)
  }
}
