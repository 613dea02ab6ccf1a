package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.columnar.CachedRDDBuilder

/** Bridge to the `private[sql]` CacheManager so the session broadcast
  * cache's sweep can ask the DIRECT question — "is this CachedRDDBuilder
  * still the registered builder for its plan?" — instead of inferring
  * liveness from block-manager state. `df.unpersist()` /
  * `spark.catalog.clearCache()` remove the entry from the CacheManager
  * synchronously on the driver, so this is an in-memory list lookup: no
  * executor RPCs, and memory-pressure block eviction (which leaves the
  * relation registered) can never read as "unpersisted". */
object CacheBridge {
  def builderLive(session: SparkSession, builder: AnyRef): Boolean = {
    val b = builder.asInstanceOf[CachedRDDBuilder]
    session.sharedState.cacheManager.lookupCachedData(session, b.logicalPlan)
      .exists(_.cachedRepresentation.cacheBuilder eq b)
  }
}
