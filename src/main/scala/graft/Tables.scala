package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All `SparkEntry.queries` are phrased over these parquet tables so the
  * driver can run the DuckDB oracle on the identical inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One resolved relation per (session, dir, table) — what a catalog gives
    * a real deployment. Re-running `spark.read.parquet` per query call
    * re-lists files and re-reads footers on the driver (~50 ms/table), which
    * at 100 TB scale is exactly the metadata work a metastore amortizes.
    *
    * Scoped per SparkSession; a cached DataFrame strongly references its
    * session, so weak keys could never collect an entry — instead, entries
    * of STOPPED sessions are evicted on the next access from any session,
    * which releases their relations across session churn. Static-data
    * assumption: the file listing is frozen at first read per (session,
    * dir, table); rewriting a directory mid-session requires a new session
    * (or `refreshByPath`), exactly like a metastore-cached relation. */
  private val cache = new java.util.HashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        cache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((sfDir, name), { _ =>
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4 rejects
      // by default; read nanos as long (queries convert when needed).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // The testdata files are ONE parquet row group each, so a scan cannot
      // parallelize by byte ranges — optional ingest repartition restores
      // scan parallelism when the relation is cached (Bench warm path). On
      // a real deployment parallelism comes from many files/row groups and
      // this stays unset (0).
      spark.conf.getOption("graft.table.repartition").map(_.toInt) match {
        case Some(n) if n > 0 => df.repartition(n)
        case _ => df
      }
    })
  }

  /** Microseconds-since-epoch for `events.ts` as a SQL fragment, dispatched
    * on the column's ACTUAL type — the testdata has shipped two vintages:
    * INT64 TIMESTAMP(NANOS) (read as raw nanos longs via `nanosAsLong`,
    * converted with integral `div`) and TIMESTAMP_NTZ(µs). Sessions are
    * UTC-pinned, so the ntz->timestamp cast is a tz-free reinterpretation
    * and `unix_micros` matches DuckDB's `epoch_us(ts)` exactly. Every
    * ts-consuming query MUST go through this dispatch instead of assuming a
    * vintage: the r9 regression (7 queries red) was exactly that assumption
    * going stale. */
  def tsUsSql(df: DataFrame): String = df.schema("ts").dataType match {
    case LongType          => "(ts div 1000)"
    case TimestampNTZType  => "unix_micros(cast(ts as timestamp))"
    case TimestampType     => "unix_micros(ts)"
    case other => throw new IllegalStateException(
      s"events.ts has unsupported type $other; expected nanos LONG, TIMESTAMP or TIMESTAMP_NTZ")
  }

  /** Column form of [[tsUsSql]]. */
  def tsUs(df: DataFrame): Column = expr(tsUsSql(df))

  def lineitem(spark: SparkSession, d: String): DataFrame  = t(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame    = t(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame  = t(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = t(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = t(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = t(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = t(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame    = t(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = t(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = t(spark, d, "embeddings")
}
