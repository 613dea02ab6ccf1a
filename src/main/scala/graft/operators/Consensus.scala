package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consensus aggregation family (SURVEY.md §2.4 A1–A3) — the reference's
  * founded-year voting rules (founded_year.py:203-266) re-expressed as
  * group-by pipelines over a long `(key, method, candidate)` table.
  *
  * Testdata phrasing: key = events.user_id, method = events.event_type,
  * candidate = the integer `k` inside events.props. "google" (the
  * 10-weighted method, founded_year.py:230-247) maps to 'purchase'.
  *
  * All three are single-shuffle groupBys with map-side partial aggregation —
  * the shape that scales linearly to 100 TB.
  */
object Consensus {

  /** Long-format candidate table. Candidate domain is k mod 25 so the strict
    * all-methods intersection (A1) is attainable but not trivial.
    *
    * Materialized once per session (graft.Persisted): the reference builds
    * its per-method candidate sets once and applies all three voting rules
    * to the same structure (founded_year.py:203-266) — here A1 reads it
    * twice (per-key method totals + per-candidate counts) and A2/A3 reuse
    * it, so one scan feeds every consensus rule. */
  def candidates(spark: SparkSession, d: String): DataFrame =
    graft.Persisted.of(spark, s"$d#consensus_candidates") {
      Tables.events(spark, d).select(
        col("user_id"),
        col("event_type").as("method"),
        // native fixed-shape probe: props is flat machine-written JSON, and
        // per-row Jackson parser construction stalls hot scans (see
        // graft.plans.JsonFieldUtil)
        (graft.plans.jsonLong(col("props"), "k").cast("int") % 25).as("k"))
    }

  private val candidatesSql =
    "SELECT user_id, event_type AS method, CAST(regexp_extract(props, '(\\d+)', 1) AS INTEGER) % 25 AS k FROM events"

  /** A1: consensus = min of the intersection of every method's candidate set
    * (founded_year.py:203-217). Relationally: a candidate seen by all of the
    * key's methods; keys with an empty intersection drop out. */
  val a1Consensus = QueryDef("a1_consensus",
    s"""WITH cand AS ($candidatesSql),
      |tot AS (SELECT user_id, COUNT(DISTINCT method) AS n_methods FROM cand GROUP BY user_id),
      |per_k AS (SELECT user_id, k, COUNT(DISTINCT method) AS n_m FROM cand GROUP BY user_id, k)
      |SELECT p.user_id, CAST(MIN(p.k) AS INTEGER) AS consensus_k
      |FROM per_k p JOIN tot t ON p.user_id = t.user_id AND p.n_m = t.n_methods
      |GROUP BY p.user_id""".stripMargin) { (spark, d) =>
    val cand = candidates(spark, d)
    val tot = cand.groupBy("user_id").agg(countDistinct("method").as("n_methods"))
    val perK = cand.groupBy("user_id", "k").agg(countDistinct("method").as("n_m"))
    perK.join(tot, Seq("user_id"))
      .filter(col("n_m") === col("n_methods"))
      .groupBy("user_id").agg(min("k").as("consensus_k"))
  }

  /** A2: weighted vote — +1 per ordinary method containing the candidate,
    * +10 if the privileged method contains it; threshold >= 11 means
    * "privileged + at least one other" (founded_year.py:230-247). */
  val a2WeightedVote = QueryDef("a2_weighted_vote",
    s"""WITH cand AS ($candidatesSql),
      |scored AS (
      |  SELECT user_id, k,
      |    CAST(COUNT(DISTINCT CASE WHEN method <> 'purchase' THEN method END) AS BIGINT)
      |      + 10 * MAX(CASE WHEN method = 'purchase' THEN 1 ELSE 0 END) AS vote_score
      |  FROM cand GROUP BY user_id, k)
      |SELECT user_id, CAST(MIN(k) AS INTEGER) AS vote_k
      |FROM scored WHERE vote_score >= 11 GROUP BY user_id""".stripMargin) { (spark, d) =>
    candidates(spark, d)
      .groupBy("user_id", "k")
      .agg((countDistinct(when(col("method") =!= "purchase", col("method"))) +
        lit(10) * max(when(col("method") === "purchase", 1).otherwise(0))).as("vote_score"))
      .filter(col("vote_score") >= 11)
      .groupBy("user_id").agg(min("k").as("vote_k"))
  }

  /** A3: priority fallback — first non-empty method in a fixed order wins,
    * then min within it (founded_year.py:249-266). Single conditional-agg
    * pass, coalesced in priority order. */
  val a3PriorityFallback = QueryDef("a3_priority_fallback",
    s"""WITH cand AS ($candidatesSql)
      |SELECT user_id,
      |  CAST(COALESCE(
      |    MIN(CASE WHEN method = 'signup' THEN k END),
      |    MIN(CASE WHEN method = 'error' THEN k END),
      |    MIN(CASE WHEN method = 'click' THEN k END),
      |    MIN(k)) AS INTEGER) AS fallback_k
      |FROM cand GROUP BY user_id""".stripMargin) { (spark, d) =>
    candidates(spark, d)
      .groupBy("user_id")
      .agg(coalesce(
        min(when(col("method") === "signup", col("k"))),
        min(when(col("method") === "error", col("k"))),
        min(when(col("method") === "click", col("k"))),
        min(col("k"))).as("fallback_k"))
  }

  val all: Seq[QueryDef] = Seq(a1Consensus, a2WeightedVote, a3PriorityFallback)
}
