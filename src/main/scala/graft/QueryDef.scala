package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation phrased over the
  * testdata tables plus (optionally) an equivalent ANSI SQL string the
  * driver runs in DuckDB over the same parquet (SparkEntry contract).
  *
  * Determinism rules (SURVEY.md §7.3): exact decimal arithmetic for sums
  * (cast back to double), integer scores where possible, total orderings on
  * every window/top-k, pinned constants, second-truncated timestamps.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
}
