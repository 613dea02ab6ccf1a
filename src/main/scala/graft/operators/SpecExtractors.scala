package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The reference's spec'd-but-stubbed extraction attempts and the remaining
  * grouping/join-shape coverage:
  *
  *  - X15 src-path name extraction (step3_attempt3.py:32-68 — spec'd in its
  *    docstring, body stubbed): image `src` under `/uploads/…` contributes
  *    an entity name from the alphabetic token run, `-`/`_`/extension
  *    bounded, dashes to spaces.
  *  - X16 href slug extraction (step3_attempt4.py:32-61 — spec'd, stubbed):
  *    ranked keyword sets {investments,portfolio,companies} >
  *    {company,funds}; slug is the path segment after the keyword.
  *  - GROUPING SETS via the Dataset.groupingSets API (the third member of
  *    the grouping family next to rollup_agg/cube_agg).
  *  - Salt-spread join: the manual skew mitigation for a hot key — fact
  *    rows hash into S salt lanes, the dimension replicates S times, the
  *    join key widens to (key, salt) so one hot key occupies S reducer
  *    partitions instead of one. Results are identical to the plain join
  *    (the oracle runs the unsalted SQL). AQE's skew-join split is the
  *    adaptive alternative; this is the static form that also works where
  *    AQE can't see the skew (e.g. a broadcast-ineligible dimension).
  *
  * All inputs are synthesized column-wise from the driver tables so the
  * DuckDB oracle replays the identical strings.
  */
object SpecExtractors {

  /** Shared X15 pattern (Java and RE2 compatible). */
  private val srcNameRe = "/uploads/(?:[^/]*/)*([A-Za-z][A-Za-z-]*?)(?:-\\d|[_.])"

  /** X15: `/uploads/2024/01/<Name-With-Dashes>-412x412.jpg` -> `Name With
    * Dashes`. The capture is the maximal alphabetic/dash run before the
    * first `-digit`, `_` or `.` boundary. */
  val x15SrcName = QueryDef("x15_src_name",
    s"""SELECT p_partkey, src,
      |  replace(regexp_extract(src, '$srcNameRe', 1), '-', ' ') AS card_name
      |FROM (
      |  SELECT p_partkey,
      |    concat('/uploads/2024/01/', replace(p_name, ' ', '-'), '-',
      |           CAST(p_partkey AS VARCHAR), 'x412.jpg') AS src
      |  FROM part) t
      |WHERE regexp_extract(src, '$srcNameRe', 1) <> ''""".stripMargin) { (spark, d) =>
    Tables.part(spark, d)
      .select(col("p_partkey"),
        concat(lit("/uploads/2024/01/"), regexp_replace(col("p_name"), " ", "-"),
          lit("-"), col("p_partkey").cast("string"), lit("x412.jpg")).as("src"))
      .withColumn("card_name",
        regexp_replace(regexp_extract(col("src"), srcNameRe, 1), "-", " "))
      .filter(col("card_name") =!= "")
      .select("p_partkey", "src", "card_name")
  }

  private val slugRe = "(?:investments|portfolio|companies|company|funds)/([^/?#]+)"

  /** X16: ranked href slug — rank 1 for {investments,portfolio,companies},
    * rank 2 for {company,funds}; hrefs without a keyword drop out. */
  val x16HrefSlug = QueryDef("x16_href_slug",
    s"""SELECT s_suppkey, href, rank, regexp_extract(href, '$slugRe', 1) AS slug
      |FROM (
      |  SELECT s_suppkey,
      |    CASE WHEN s_suppkey % 4 = 0 THEN concat('/investments/', slug0)
      |         WHEN s_suppkey % 4 = 1 THEN concat('/portfolio/', slug0, '?ref=nav')
      |         WHEN s_suppkey % 4 = 2 THEN concat('/company/', slug0, '/about')
      |         ELSE concat('/team/', slug0) END AS href,
      |    CASE WHEN s_suppkey % 4 IN (0, 1) THEN 1
      |         WHEN s_suppkey % 4 = 2 THEN 2 END AS rank
      |  FROM (SELECT s_suppkey, replace(replace(lower(s_name), '#', ''), ' ', '-') AS slug0
      |        FROM supplier) b) t
      |WHERE rank IS NOT NULL""".stripMargin) { (spark, d) =>
    val slug0 = regexp_replace(regexp_replace(lower(col("s_name")), "#", ""), " ", "-")
    Tables.supplier(spark, d)
      .select(col("s_suppkey"), slug0.as("slug0"))
      .select(col("s_suppkey"),
        when(col("s_suppkey") % 4 === 0, concat(lit("/investments/"), col("slug0")))
          .when(col("s_suppkey") % 4 === 1, concat(lit("/portfolio/"), col("slug0"), lit("?ref=nav")))
          .when(col("s_suppkey") % 4 === 2, concat(lit("/company/"), col("slug0"), lit("/about")))
          .otherwise(concat(lit("/team/"), col("slug0"))).as("href"),
        when(col("s_suppkey") % 4 === 0 || col("s_suppkey") % 4 === 1, 1)
          .when(col("s_suppkey") % 4 === 2, 2).as("rank"))
      .filter(col("rank").isNotNull)
      .withColumn("slug", regexp_extract(col("href"), slugRe, 1))
      .select("s_suppkey", "href", "rank", "slug")
  }

  /** step3_attempt2 anchor chain (step3_attempt2.py:33-45): six page shapes
    * cycling on s_suppkey % 6, one per extraction rank — anchor/img-alt/
    * figcaption inside an A-B class (ranks A/B/C), then the same chain
    * inside a low-ranked class (ranks D/E/F). Runs the real
    * PortCoPipeline.attempt2 operator over graft_html_class_elements
    * cards. */
  val xa2AnchorChain = QueryDef("xa2_anchor_chain",
    """SELECT s_name AS firm_name,
      |  CASE WHEN s_suppkey % 6 < 3 THEN 'portfolio card' ELSE 'logo' END AS class_used,
      |  CAST(s_suppkey % 6 % 3 + 1 AS INTEGER) AS step3_method,
      |  CASE s_suppkey % 6 WHEN 0 THEN 'A' WHEN 1 THEN 'B' WHEN 2 THEN 'C'
      |       WHEN 3 THEN 'D' WHEN 4 THEN 'E' ELSE 'F' END AS extraction_rank,
      |  'PortCo ' || CAST(s_suppkey AS VARCHAR) AS name
      |FROM supplier""".stripMargin) { (spark, d) =>
    val k = col("s_suppkey").cast("string")
    val m = col("s_suppkey") % 6
    val inner = when(m % 3 === 0, concat(lit("""<a href="/x">PortCo """), k, lit("</a>")))
      .when(m % 3 === 1, concat(lit("""<img alt="PortCo """), k, lit("\">")))
      .otherwise(concat(lit("<figcaption>PortCo "), k, lit("</figcaption>")))
    val cls = when(m < 3, "portfolio card").otherwise("logo")
    val html = concat(lit("<div class=\""), cls, lit("\">"), inner, lit("</div>"))
    val pages = Tables.supplier(spark, d).select(
      col("s_name").as("firm_name"),
      lit("https://www.firm.example.com").as("firm_url"),
      html.as("html"))
    PortCoPipeline.attempt2(pages)
  }

  /** GROUPING SETS ((r_name, n_name), (r_name), ()) over the customer
    * dimension chain — Dataset.groupingSets API, dims broadcast.
    * c_acctbal can be negative, so the fixed-point per-row round uses
    * round() (half-away both engines), not the positive-only +0.5 cast. */
  val gsGroupingSets = QueryDef("gs_grouping_sets",
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) AS INTEGER) AS g_r,
      |  CAST(GROUPING(n_name) AS INTEGER) AS g_n,
      |  COUNT(*) AS n_cust,
      |  SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS acctbal_sum
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""".stripMargin) { (spark, d) =>
    Tables.customer(spark, d)
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"),
        count(lit(1)).as("n_cust"),
        (sum(round(col("c_acctbal") * 100).cast("long")) / 100.0).as("acctbal_sum"))
      .select("r_name", "n_name", "g_r", "g_n", "n_cust", "acctbal_sum")
  }

  /** Salt factor: a hot key spreads over this many reducer lanes. */
  val Salts = 8

  /** Salt-spread equi-join (via Scale.saltedJoin), aggregated per segment.
    * The dimension is SHUFFLE_HASH-hinted: under an auto-broadcast the
    * salting would be inert (a broadcast join has no reducer-side key skew
    * to spread), so the query pins the shuffled-join regime it exists to
    * demonstrate — the widened (key, salt) pair spreads one hot customer
    * over 8 reducer partitions. The oracle replays the PLAIN join — salting
    * must be invisible in the result. */
  val jSalted = QueryDef("j_salted",
    """SELECT c_mktsegment, COUNT(*) AS order_cnt,
      |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin) { (spark, d) =>
    val fact = Tables.orders(spark, d).select("o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .hint("shuffle_hash")
    Scale.saltedJoin(fact, dim, "o_custkey", Salts)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("order_cnt"),
        (sum((col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0).as("revenue"))
  }

  /** F8: type white/blacklist set-overlap gate (step3_attempt1.py:72-73,
    * 156-173,364-367): reject when the entity's @type set overlaps the
    * blacklist UNLESS it also overlaps the whitelist. Types synthesized by
    * tokenizing p_type. */
  val f8TypeGate = QueryDef("f8_type_gate",
    """SELECT p_partkey, p_type FROM (
      |  SELECT p_partkey, p_type, string_split(p_type, ' ') AS types FROM part) t
      |WHERE len(list_intersect(types, ['BRUSHED','ANODIZED','PLATED'])) > 0
      |   OR NOT len(list_intersect(types, ['TIN','COPPER'])) > 0""".stripMargin) { (spark, d) =>
    val types = split(col("p_type"), " ")
    val wl = array(Seq("BRUSHED", "ANODIZED", "PLATED").map(lit): _*)
    val bl = array(Seq("TIN", "COPPER").map(lit): _*)
    Tables.part(spark, d)
      .filter(arrays_overlap(types, wl) || !arrays_overlap(types, bl))
      .select("p_partkey", "p_type")
  }

  /** X20: has-all-words substring rank match (step2_attempt1.py:44-52,
    * 69-77): rank by the first word set whose every word substring-matches
    * some class token; counted per rank to keep the output compact. Pure
    * higher-order lambdas on both engines (forall/exists vs list_filter). */
  val x20RankMatch: QueryDef = {
    def filtSql(words: String, n: Int) =
      s"len(list_filter([$words], w -> len(list_filter(toks, t -> contains(t, w))) > 0)) = $n"
    QueryDef("x20_rank_match",
      s"""WITH t AS (SELECT p_partkey,
        |    string_split(lower(concat(p_type, ' ', p_brand)), ' ') AS toks FROM part),
        |r AS (SELECT p_partkey,
        |    CASE WHEN ${filtSql("'stand','bra'", 2)} THEN 1
        |         WHEN ${filtSql("'econ'", 1)} THEN 2
        |         WHEN len(list_filter(toks, t -> contains(t, 'promo'))) > 0 THEN 3 END AS rank
        |  FROM t)
        |SELECT rank, COUNT(*) AS n FROM r WHERE rank IS NOT NULL GROUP BY rank""".stripMargin) { (spark, d) =>
      val toks = split(lower(concat(col("p_type"), lit(" "), col("p_brand"))), " ")
      def matchAll(words: Seq[String]) =
        forall(array(words.map(lit): _*),
          w => exists(toks, t => t.contains(w)))
      Tables.part(spark, d)
        .select(when(matchAll(Seq("stand", "bra")), 1)
          .when(matchAll(Seq("econ")), 2)
          .when(exists(toks, t => t.contains("promo")), 3).as("rank"))
        .filter(col("rank").isNotNull)
        .groupBy("rank").agg(count(lit(1)).as("n"))
    }
  }

  /** FULL OUTER join — both null sides exercised: customers in arrears with
    * no finished orders, and finished-order customers not in arrears. */
  val jFullOuter = QueryDef("j_full_outer",
    """SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey, o.f_orders, c.c_acctbal
      |FROM (SELECT o_custkey, COUNT(*) AS f_orders FROM orders
      |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) o
      |FULL JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0) c
      |  ON o.o_custkey = c.c_custkey""".stripMargin) { (spark, d) =>
    val o = Tables.orders(spark, d).filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey").agg(count(lit(1)).as("f_orders"))
    val c = Tables.customer(spark, d).filter(col("c_acctbal") < 0)
      .select("c_custkey", "c_acctbal")
    o.join(c, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("f_orders"), col("c_acctbal"))
  }

  /** X18 date bucketing, timezone-free by construction: epoch-microsecond
    * ts (via the `Tables.tsUsSql` schema dispatch — nanos-long and
    * timestamp_ntz vintages both land on integral µs) to a pure DATE via
    * integer day arithmetic (no session-timezone rendering — the
    * cross-engine hazard of date_format/strftime on TIMESTAMP). Restricted
    * to ts >= 0 on BOTH sides: for pre-epoch values Spark's `div` truncates
    * toward zero while a timestamp->date cast floors, so the equivalence is
    * only by-construction on the non-negative domain (the events table is
    * entirely post-epoch; the filter makes the parity claim hold regardless
    * of data). */
  val x18DateBucket = QueryDef("x18_date_bucket",
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      |FROM events WHERE ts >= TIMESTAMP '1970-01-01 00:00:00' GROUP BY 1""".stripMargin) { (spark, d) =>
    val raw = Tables.events(spark, d)
    val us = Tables.tsUsSql(raw)
    // The guard must exclude EXACTLY what the oracle's `ts >= TIMESTAMP
    // '1970-01-01'` excludes: on the nanos-long vintage a raw value in
    // [-999, -1] ns still lands on µs 0 under truncating div, so the
    // filter runs on the RAW nanos there; µs-resolution vintages have no
    // sub-µs values and filter on the dispatched µs directly.
    val nonNeg = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts") >= 0L
      case _ => expr(s"$us >= 0")
    }
    raw
      .filter(nonNeg)
      .withColumn("day",
        expr(s"CAST(date_add(DATE'1970-01-01', CAST($us div 86400000000 AS INT)) AS STRING)"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
  }

  val all: Seq[QueryDef] = Seq(
    x15SrcName, x16HrefSlug, xa2AnchorChain, gsGroupingSets, jSalted, f8TypeGate,
    x20RankMatch, jFullOuter, x18DateBucket)
}
