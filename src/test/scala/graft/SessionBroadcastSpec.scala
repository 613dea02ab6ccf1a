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

  test("executed plan carries SessionCachedBroadcast over the static dim") {
    val df = runJ4()
    df.collect() // execute THIS plan so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SessionCachedBroadcast"),
      s"expected SessionCachedBroadcast in executed plan:\n$p")
  }
}
