package graft

import graft.operators.{SeedPipeline, Sinks}
import graft.sources.Connectors
import graft.streaming.StreamingSeed
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming seed ingest (§2.9), connector scaffolding (S4–S7), sinks (K1–K4). */
class StreamingAndIoSpec extends SparkSpec {
  import spark.implicits._

  test("streaming seed ingest reproduces the golden 28 firms") {
    val q = StreamingSeed.runToMemory(spark, "/root/reference/logs", "seed_stream")
    try {
      val got = spark.table("seed_stream")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = spark.read.option("header", "true")
        .csv("/root/reference/output/PE_firms.csv")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want)
      assert(got.size == 28)
    } finally q.stop()
  }

  test("withRetry retries with base-2 exponential backoff then succeeds") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Connectors.withRetry(maxRetries = 5, baseDelayMs = 100, sleep = delays += _) { () =>
      calls += 1
      if (calls < 4) throw new RuntimeException("429")
      "ok"
    }
    assert(out == "ok")
    assert(calls == 4)
    assert(delays.toSeq == Seq(100L, 200L, 400L)) // base-2, like the reference
  }

  test("withRetry gives up after maxRetries") {
    var calls = 0
    intercept[RuntimeException] {
      Connectors.withRetry(maxRetries = 2, baseDelayMs = 0, sleep = _ => ()) { () =>
        calls += 1; throw new RuntimeException("boom")
      }
    }
    assert(calls == 3)
  }

  test("probePages enriches with accessibility; F12 extensions always fail") {
    val urls = Seq("https://x.com/portfolio", "https://x.com/report.pdf").toDF("url")
    val out = Connectors.probePages(urls, "url").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!out("https://x.com/report.pdf"))
  }

  test("K2 JSONL append sink round-trips the envelope") {
    val dir = Files.createTempDirectory("graft_k2").toString + "/logs"
    val df = Seq(("2025-01-01T00:00:00", "https://a", 200L)).toDF("datetime", "url", "status")
    Sinks.appendJsonl(df, dir, Seq("datetime", "url", "status"))
    Sinks.appendJsonl(df, dir, Seq("datetime", "url", "status")) // append again
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.select("url").distinct().collect().head.getString(0) == "https://a")
  }

  test("A4+K3 nested assembly emits sorted portco docs per firm") {
    val firms = Seq(("acme"), ("zen")).toDF("firm")
    val portcos = Seq(
      ("acme", "beta", "https://b", 2.0),
      ("acme", "alpha", "https://a", 1.0)
    ).toDF("firm", "name", "url", "score")
    val out = Sinks.nestedAssembly(firms, portcos, "firm")
    val acme = out.filter($"firm" === "acme").select("portcos").collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(acme.map(_.getString(0)) == Seq("alpha", "beta")) // sorted
    val zen = out.filter($"firm" === "zen").select(size($"portcos")).collect().head.getInt(0)
    assert(zen == 1) // left join keeps firm with a single null-struct entry

    val dir = Files.createTempDirectory("graft_k3").toString + "/docs"
    Sinks.writeNestedJson(out, dir)
    assert(spark.read.json(dir).count() == 2)
  }

  test("ORC sink round-trips with pushdown on read") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/orc"
    Sinks.writeOrc(Tables.customer(spark, sf0001), dir)
    val back = spark.read.orc(dir).filter($"c_custkey" < 50)
    assert(back.count() ==
      Tables.customer(spark, sf0001).filter($"c_custkey" < 50).count())
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan(c_custkey,50)"),
      s"expected ORC pushdown:\n$scan")
  }

  test("K4 run-partitioned sink prunes by run_ts on read") {
    val dir = Files.createTempDirectory("graft_k4").toString + "/runs"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Sinks.writeRunPartitioned(df, dir, "2025-01-01_00-00-00")
    Sinks.writeRunPartitioned(df, dir, "2025-01-02_00-00-00")
    val all = spark.read.parquet(dir)
    assert(all.count() == 4)
    val one = all.filter($"run_ts" === "2025-01-01_00-00-00")
    assert(one.count() == 2)
    // partition pruning visible in the plan
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.inputFiles.length == 1)
  }
}
