package graft

import graft.plans.SessionBroadcastCache

/** The session broadcast cache (plans/SessionBroadcast.scala): a dim's
  * broadcast must be BUILT once per session and REUSED by later actions,
  * without changing results vs vanilla planning. */
class SessionBroadcastSpec extends SparkSpec {

  private def runJ4() = SparkEntry.queries("j4_join_chain")(spark, sf0001)

  test("dim broadcast is reused across actions; results match vanilla planning") {
    // vanilla reference: rule disabled
    spark.conf.set("graft.broadcast.sessionReuse", "false")
    val vanilla =
      try runJ4().collect().map(_.toSeq).toSet
      finally spark.conf.set("graft.broadcast.sessionReuse", "true")

    // first action populates the cache (misses), second must HIT — the
    // whole point: no dim re-scan/rebuild job on re-execution
    runJ4().count()
    val (_, h0, m0) = SessionBroadcastCache.stats(spark.sparkContext)
    runJ4().count()
    val (_, h1, m1) = SessionBroadcastCache.stats(spark.sparkContext)
    assert(h1 > h0, "second action must reuse the session-cached broadcast")
    assert(m1 == m0, "second action must not rebuild any broadcast")

    assert(runJ4().collect().map(_.toSeq).toSet === vanilla,
      "cached-broadcast plan must produce identical rows to vanilla")
  }

  test("Persisted.clear drops ONLY broadcasts over the evicted relation") {
    // two actions: the FIRST materializes the cust_nkey IMR (whose
    // pre-materialization stats can make the planner pick a different
    // build side); the SECOND plans the dim broadcasts that populate the
    // cache
    runJ4().count(); runJ4().count()
    val (n0, _, _) = SessionBroadcastCache.stats(spark.sparkContext)
    assert(n0 >= 1)
    // clearing an unrelated prefix evicts nothing -> broadcasts untouched
    Persisted.clear(spark, "spec#no-such-prefix/")
    assert(SessionBroadcastCache.stats(spark.sparkContext)._1 == n0)
    // an unrelated persisted relation: its eviction must not take the dim
    // broadcast with it (targeted invalidation, code-review r7)
    Persisted.of(spark, "spec#bystander") {
      spark.range(3).toDF("x")
    }.count()
    Persisted.clear(spark, "spec#bystander")
    assert(SessionBroadcastCache.stats(spark.sparkContext)._1 == n0,
      "evicting an unrelated relation must keep the dim broadcast")
    // evicting the fact-side dim itself must invalidate its broadcast entry
    Persisted.clear(spark, s"$sf0001#cust_nkey")
    val (n1, _, _) = SessionBroadcastCache.stats(spark.sparkContext)
    assert(n1 < n0, "the evicted relation's broadcast must be dropped")
    // and later actions transparently rebuild (two again: the first
    // re-materializes the fresh IMR, the second plans its broadcast)
    val (_, _, m1) = SessionBroadcastCache.stats(spark.sparkContext)
    runJ4().count(); runJ4().count()
    val (n2, _, m2) = SessionBroadcastCache.stats(spark.sparkContext)
    assert(n2 >= n0 && m2 > m1, "later actions rebuild the dim broadcast")
  }

  test("clear-then-reuse: rebuilt relation's consumers see fresh data, never a stale broadcast") {
    import org.apache.spark.sql.functions._
    // Same parquet path overwritten between builds: the rebuilt relation
    // has an IDENTICAL canonical plan but different data — exactly the
    // shape where a broadcast cache keyed only on plan text (ignoring the
    // CachedRDDBuilder identity) would serve the stale hash relation.
    val dir = java.nio.file.Files.createTempDirectory("ctr_dim").toString
    def writeDim(tag: String): Unit =
      spark.range(5).select(col("id"), lit(tag).as("tag"))
        .write.mode("overwrite").parquet(dir)
    def q(): Set[String] = {
      val dim = Persisted.of(spark, "spec#ctr_dim") { spark.read.parquet(dir) }
      spark.range(5).toDF("id2")
        .join(broadcast(dim), col("id2") === col("id"))
        .select("tag").distinct().collect().map(_.getString(0)).toSet
    }
    writeDim("v1")
    assert(q() === Set("v1"))
    assert(q() === Set("v1")) // second action plans + caches the dim broadcast
    Persisted.clear(spark, "spec#ctr_dim")
    writeDim("v2")
    assert(q() === Set("v2"),
      "after clear + rebuild, consumers must read the fresh relation — " +
        "a stale session-cached broadcast leaked through invalidation")
    // cleanup so later suites don't inherit the spec relation
    Persisted.clear(spark, "spec#ctr_dim")
  }

  test("external df.unpersist() is caught by the access-time sweep") {
    import org.apache.spark.sql.functions._
    // a persisted dim cached OUTSIDE Persisted (hand-managed .persist()):
    // its broadcast entry must be swept once the relation is unpersisted
    // externally, without Persisted.clear ever being involved.
    // Start from an empty cache: suites share one SparkContext, and once
    // earlier suites fill all maxEntries slots this test's dim would
    // never be cached at all (round 13: the wider ADC-table fan plus the
    // routed band stores pushed the suite past 64 entries) — the test
    // pins SWEEP semantics, not cross-suite slot accounting.
    SessionBroadcastCache.clear(spark.sparkContext)
    val dim = spark.range(7).select(col("id"), (col("id") * 2).as("y")).persist()
    dim.count() // materialize the IMR
    def q() = spark.range(7).toDF("id2")
      .join(broadcast(dim), col("id2") === col("id")).count()
    q(); q() // second action plans + caches the dim broadcast
    val (n0, _, _) = SessionBroadcastCache.stats(spark.sparkContext)
    assert(n0 >= 1, "the hand-persisted dim must populate the broadcast cache")
    // sweeping while the relation is LIVE drops nothing
    assert(SessionBroadcastCache.sweep(spark.sparkContext) === 0,
      "sweep must not evict entries over live relations")
    dim.unpersist(blocking = true) // external path: no Persisted.clear
    val swept = SessionBroadcastCache.sweep(spark.sparkContext)
    assert(swept >= 1, "externally-unpersisted relation's broadcast must be swept")
    assert(SessionBroadcastCache.stats(spark.sparkContext)._1 === n0 - swept)
  }

  test("executed plan carries SessionCachedBroadcast over the static dim") {
    val df = runJ4()
    df.collect() // execute THIS plan so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SessionCachedBroadcast"),
      s"expected SessionCachedBroadcast in executed plan:\n$p")
  }
}
