package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All oracle-checked query definitions, grouped by operator family. */
  def defs: Seq[QueryDef] =
    CoreQueries.all ++ Consensus.all ++ Dedup.all ++
      Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      ExtendedQueries.all ++ TemporalQueries.all ++ PipelineQueries.all ++
      SpecExtractors.all ++ EventAnalytics.all ++ Clustering.all ++
      GraphQueries.all ++ QualityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
