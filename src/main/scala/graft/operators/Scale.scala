package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted joins and bucketed co-located joins — the
  * knobs a 100 TB run needs when AQE's automatic skew handling isn't enough
  * or when a join key is reused across many queries.
  */
object Scale {

  /** Skew-salted equi-join: the build (small) side is replicated
    * `saltFactor` ways; the probe (large, skewed) side picks a deterministic
    * salt per row. Hot keys spread over `saltFactor` reducers instead of one.
    *
    * Result is row-identical to `large.join(small, keys)` — the salt is an
    * internal column dropped before returning.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by `key` as a managed table. Two
    * tables bucketed the same way join WITHOUT a shuffle (co-located
    * sort-merge join) — the 100 TB answer to repeated large-large joins on
    * one key. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
