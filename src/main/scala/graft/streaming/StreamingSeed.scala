package graft.streaming

import graft.operators.SeedPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming restatement of the seed ingest (SURVEY.md §2.9).
  *
  * The reference captures network responses via a push callback appending to
  * a session JSONL file (seed_aic.py:104-156,290). Here the log directory is
  * a streaming file source; the capture filters F3/F4 become stream
  * predicates; the first-seen dedup (W1, seenFirms set at seed_aic.py:311)
  * becomes stateful streaming `dropDuplicates` — with a bounded crawl
  * session there is no watermarking concern (no late data, state is the
  * session's firm set).
  */
object StreamingSeed {

  /** Streaming PE-firm extraction over a (growing) logs directory. */
  def firmsStream(spark: SparkSession, logsDir: String): DataFrame = {
    val logs = spark.readStream
      .schema(SeedPipeline.logSchema)
      .option("maxFilesPerTrigger", 1) // replay session files one at a time
      .json(logsDir)
    val values = col("JSON").getField("Items").getField("$values")
    logs
      .filter(col("url").contains("investmentcouncil.com.au") &&
        !col("url").contains("maps.googleapis.com") && col("status") === 200)
      .filter(values.isNotNull && size(values) > 0 &&
        values.getItem(0).getField("FullName").isNotNull)
      .select(explode(values).as("m"))
      .select(col("m.*"))
      .filter(col("`filter-Member Type`").isin("PE", "private equity") &&
        col("LongLatAddress").contains("Australia"))
      .select("FullName", "Website")
      .dropDuplicates("FullName")
  }

  /** Run the stream into an in-memory table until the directory is drained;
    * returns the started query (caller stops it). */
  def runToMemory(spark: SparkSession, logsDir: String, tableName: String): StreamingQuery = {
    val q = firmsStream(spark, logsDir).writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q
  }
}
