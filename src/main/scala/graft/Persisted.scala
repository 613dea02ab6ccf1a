package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted intermediate relations (sketch tables, banded
  * signatures): built once per (session, key), stored MEMORY_AND_DISK so a
  * skewed or oversized relation spills instead of OOMing, and weakly keyed
  * on the session so stopped sessions release their blocks.
  *
  * This is what lets a self-join read its input once without collecting
  * whole join groups into a single aggregation buffer: both join sides
  * scan the same InMemoryRelation, and the join itself streams (sort-merge
  * buffers spill per key; AQE splits skewed partitions) — bounded memory
  * even when one LSH bucket degenerates to O(N).
  */
object Persisted {
  private val cache = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def of(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => build.persist(StorageLevel.MEMORY_AND_DISK))
  }
}
