package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted intermediate relations (sketch tables, banded
  * signatures, term stores): built once per (session, key), stored
  * MEMORY_AND_DISK so a skewed or oversized relation spills instead of
  * OOMing.
  *
  * Lifecycle: a cached DataFrame strongly references its SparkSession, so
  * weak keys alone can never collect an entry — instead, entries of
  * STOPPED sessions are explicitly evicted on the next access from any
  * session, which is what actually releases their plans and cache blocks
  * across session churn.
  *
  * This is what lets a self-join read its input once without collecting
  * whole join groups into a single aggregation buffer: both join sides
  * scan the same InMemoryRelation, and the join itself streams (sort-merge
  * buffers spill per key; AQE splits skewed partitions) — bounded memory
  * even when one LSH bucket degenerates to O(N).
  */
/** Tiny per-(session, key) memo for scalar gate values (store partition
  * counts, corpus counts): the Spark action that computes the value runs
  * OUTSIDE the monitor (the Persisted lock-scope rule), entries of stopped
  * sessions are swept on access, and a value is computed at most once per
  * live (session, key). Use boxed value types — the hit test is a null
  * check. One shared implementation so the subtle lock rule has one home
  * (code-review r8: three verbatim copies had grown). */
final class SessionMemo[V <: AnyRef] {
  private val m = new java.util.HashMap[(SparkSession, String), V]()
  def of(spark: SparkSession, key: String)(compute: => V): V = {
    val k = (spark, key)
    val hit = m.synchronized {
      val it = m.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      m.get(k)
    }
    if (hit != null) hit
    else {
      val v = compute // may run a Spark job: never under the monitor
      m.synchronized { m.put(k, v) }
      v
    }
  }
}

object Persisted {
  private val cache = new java.util.HashMap[
    SparkSession, java.util.HashMap[String, DataFrame]]()

  /** Build-or-get. The per-session build runs inside a reentrant monitor,
    * so a builder may itself call `Persisted.of` for a sub-relation (e.g.
    * LSH bands built over the persisted qnorm relation) without the
    * recursive-update hazard a ConcurrentHashMap.computeIfAbsent has. */
  def of(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      // evict entries of stopped sessions (see scaladoc)
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.HashMap[String, DataFrame]()
        cache.put(spark, m)
      }
      val existing = m.get(key)
      if (existing != null) existing
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        m.put(key, df)
        df
      }
    }

  /** Explicitly release entries of a live session whose key starts with
    * `keyPrefix` ("" = all): unpersists the cache blocks and forgets the
    * entry, so the next `of` rebuilds. This is the release valve for jobs
    * cycling through many distinct corpora in ONE session (e.g. per-batch
    * page-artifact relations keyed by plan hash) — without it, entries
    * live until session stop by design. Returns the number released. */
  def clear(spark: SparkSession, keyPrefix: String = ""): Int =
    clearExcept(spark, keyPrefix, keep = null)

  /** [[clear]], but the entry whose key equals `keep` survives. This is the
    * incremental-ingest eviction shape (ADVICE r6): "drop every batch
    * relation EXCEPT the one I am about to use" — re-submitting the same
    * batch keeps its persisted sketch instead of silently unpersisting a
    * relation a still-unexecuted result DataFrame depends on. */
  def clearExcept(spark: SparkSession, keyPrefix: String, keep: String): Int = {
    // Snapshot-and-remove under the monitor; force plans and unpersist
    // OUTSIDE it — optimizedPlan on a never-executed entry runs the full
    // analyzer/optimizer, and the monitor is global to every session's
    // Persisted access (code-review r7 lock-contention finding). Removing
    // first is safe: no new consumer can obtain an evicted entry.
    val evicted = cache.synchronized {
      val m = cache.get(spark)
      if (m == null) Seq.empty[DataFrame]
      else {
        val out = Seq.newBuilder[DataFrame]
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.startsWith(keyPrefix) && e.getKey != keep) {
            out += e.getValue
            it.remove()
          }
        }
        out.result()
      }
    }
    val evictedRelations = Set.newBuilder[AnyRef]
    evicted.foreach { df =>
      // record the cached representation BEFORE unpersisting: the
      // optimized plan of a cached DataFrame reads through its
      // InMemoryRelation, whose CachedRDDBuilder is the identity
      // session-cached broadcasts are correlated by. In the NORMAL path
      // the outermost IMR swallows the whole subtree (nested persisted
      // inputs live inside its physical cachedPlan), so the collect yields
      // exactly one builder; nested IMRs surface only when the entry's own
      // cache was already dropped OUTSIDE Persisted (df.unpersist(),
      // clearCache()) — then we intentionally collect them ALL and
      // over-evict (ADVICE r7): a dropped broadcast of a live store just
      // rebuilds on the next action, while an under-evicted one would pin
      // executor memory until session stop — the safe direction is over.
      // An entry surfacing NO IMR at all is logged: its broadcasts, if
      // any, cannot be correlated and would survive.
      try {
        val imrs = df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            r.cacheBuilder
        }
        if (imrs.isEmpty)
          System.err.println(
            "[persisted] evicted entry surfaced no InMemoryRelation; " +
              "any broadcast over it stays cached until session stop")
        evictedRelations ++= imrs
      } catch { case _: Throwable => () }
      df.unpersist()
    }
    // Unpersisting a relation invalidates any session-cached broadcast
    // built over it (stale-batch pinning, code-review r7) — TARGETED: only
    // entries whose cached plan reads one of the just-evicted relations
    // are dropped, so an ingest session cycling batches keeps its live dim
    // broadcasts (a blanket clear re-paid the dim rebuild once per batch).
    if (evicted.nonEmpty)
      graft.plans.SessionBroadcastCache.invalidateRelations(
        spark.sparkContext, evictedRelations.result())
    evicted.size
  }
}
