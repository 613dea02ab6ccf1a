package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end pipeline queries: the portCo and founded-year compositions
  * run over deterministic pages/texts synthesized from testdata tables, so
  * the driver's oracle exercises the full chains (JSON-LD parse -> filters
  * -> scoring -> dedup; gated extraction -> voting -> enrich join).
  *
  * The synthesized inputs are chosen so the expected output is closed-form,
  * which keeps the oracle SQL honest and simple.
  */
object PipelineQueries {

  /** Synthetic page per supplier: one A-rank card whose JSON-LD script sits
    * INSIDE the card element. Expected per supplier: that portco at score
    * 1.0 (type whitelist) + 0.3 (script inside card) = 1.3, rank B. */
  val portcoE2E = QueryDef("pipe_portco_e2e",
    """SELECT s_name AS firm_name,
      |  'PortCo ' || CAST(s_suppkey AS VARCHAR) AS name,
      |  'https://pc' || CAST(s_suppkey AS VARCHAR) || '.example.com' AS url,
      |  'Organization' AS jsonld_type,
      |  CAST(1.3 AS DOUBLE) AS score,
      |  'B' AS rank
      |FROM supplier""".stripMargin) { (spark, d) =>
    val html = concat(
      lit("""<div class="portfolio card"><script type="application/ld+json">{"@graph":[{"@type":"Organization","name":"PortCo """),
      col("s_suppkey").cast("string"),
      lit("""","url":"https://pc"""),
      col("s_suppkey").cast("string"),
      lit(""".example.com"}]}</script></div>"""))
    val pages = Tables.supplier(spark, d).select(
      col("s_name").as("firm_name"),
      concat(lit("https://www."), lower(regexp_replace(col("s_name"), "#", "")),
        lit(".example.com")).as("firm_url"),
      html.as("html"))
    PortCoPipeline.portcos(pages)
      .select("firm_name", "name", "url", "jsonld_type", "score", "rank")
  }

  /** X14 confidence-rank coverage (step3_attempt1.py:415-493): five page
    * shapes cycling on s_suppkey % 5, one per scoring regime —
    *   0: A card + anchor matching the entity url + script inside
    *      -> 1.0 + 0.9 + 0.3 = 2.2, rank A (url-domain signal);
    *   1: A card + script inside -> 1.3, rank B;
    *   2: B-rank card present, script OUTSIDE it -> 1.0 < 1.2 but org-like
    *      -> rank C keeping the weak score;
    *   3: NO classed element on the page -> no card -> rank D, score 0.0;
    *   4: A card + <strong> name hint equal to the entity name + script
    *      inside -> 1.0 + 0.7 + 0.3 = 2.0, rank A (X22 hint drives it). */
  val portcoRanks = QueryDef("pipe_portco_ranks",
    """SELECT s_name AS firm_name,
      |  'PortCo ' || CAST(s_suppkey AS VARCHAR) AS name,
      |  'https://pc' || CAST(s_suppkey AS VARCHAR) || '.example.com' AS url,
      |  'Organization' AS jsonld_type,
      |  CAST(CASE s_suppkey % 5 WHEN 0 THEN 2.2 WHEN 1 THEN 1.3 WHEN 2 THEN 1.0
      |       WHEN 3 THEN 0.0 ELSE 2.0 END AS DOUBLE) AS score,
      |  CASE s_suppkey % 5 WHEN 0 THEN 'A' WHEN 1 THEN 'B' WHEN 2 THEN 'C'
      |       WHEN 3 THEN 'D' ELSE 'A' END AS rank
      |FROM supplier""".stripMargin) { (spark, d) =>
    val k = col("s_suppkey").cast("string")
    val node = concat(
      lit("""{"@type":"Organization","name":"PortCo """), k,
      lit("""","url":"https://pc"""), k, lit(""".example.com"}"""))
    val script = concat(lit("""<script type="application/ld+json">"""),
      node, lit("</script>"))
    val html = when(col("s_suppkey") % 5 === 0,
        concat(lit("""<div class="portfolio card"><a href="https://pc"""), k,
          lit(""".example.com/about">go</a>"""), script, lit("</div>")))
      .when(col("s_suppkey") % 5 === 1,
        concat(lit("""<div class="portfolio card">"""), script, lit("</div>")))
      .when(col("s_suppkey") % 5 === 2,
        concat(lit("""<div class="portfolio">x</div>"""), script))
      .when(col("s_suppkey") % 5 === 3,
        concat(lit("<p>nothing here</p>"), script))
      .otherwise(
        concat(lit("""<div class="investment item"><strong>PortCo """), k,
          lit("</strong>"), script, lit("</div>")))
    val pages = Tables.supplier(spark, d).select(
      col("s_name").as("firm_name"),
      concat(lit("https://www."), lower(regexp_replace(col("s_name"), "#", "")),
        lit(".example.com")).as("firm_url"),
      html.as("html"))
    PortCoPipeline.portcos(pages)
      .select("firm_name", "name", "url", "jsonld_type", "score", "rank")
  }

  /** Synthetic method texts per customer; homepage+google+jsonld all agree
    * on year 1900 + custkey % 120, so consensus resolves it for every firm. */
  val foundedYearE2E = QueryDef("pipe_founded_year_e2e",
    """SELECT 'https://c' || CAST(c_custkey AS VARCHAR) AS website,
      |  c_name AS FullName,
      |  CAST(1900 + c_custkey % 120 AS INTEGER) AS Founded_Year
      |FROM customer""".stripMargin) { (spark, d) =>
    val site = concat(lit("https://c"), col("c_custkey").cast("string"))
    val year = (lit(1900) + col("c_custkey") % 120).cast("string")
    val texts = Tables.customer(spark, d).select(site.as("website"),
      explode(array(
        struct(lit("homepage").as("method"),
          concat(lit("Founded in "), year).as("text")),
        struct(lit("google").as("method"),
          concat(lit("established "), year).as("text")),
        struct(lit("jsonld").as("method"),
          concat(lit("""{"foundingDate":""""), year, lit("""-01-01"}""")).as("text"))
      )).as("mt"))
      .select(col("website"), col("mt.method"), col("mt.text"))
    val firms = Tables.customer(spark, d).select(
      concat(lit("https://c"), col("c_custkey").cast("string")).as("website"),
      col("c_name").as("FullName"))
    FoundedYear.enrich(firms, texts)
      .select(col("website"), col("FullName"), col("Founded_Year"))
  }

  /** X10/X11/X12 union-type normalization, individually attributable
    * (VERDICT r10 #6): synthesized JSON-LD nodes cycling on s_suppkey % 6
    * hit every union arm the reference handles
    * (step3_attempt1.py:77-84,209-214) —
    *   logo (X10):   0 object-with-url, 1 object-with-@id, 2 bare string,
    *                 3..5 absent (null);
    *   sameAs (X11): even bare string, odd two-element list;
    *   @type (X12):  0-1 bare string, 2-3 list with a whitelisted type in
    *                 SECOND position (preference must pick it over 'Thing'),
    *                 4-5 non-whitelisted list (falls back to first).
    * The extraction chain is the production one — json_tuple raw values
    * into logoFromRaw/sameAsFromRaw/typesFromRaw/preferWhitelisted — so a
    * regression in any arm surfaces here without bisecting
    * pipe_portco_e2e. Arrays emit as '|'-joined strings to keep the oracle
    * comparison scalar. */
  val x10UnionTypes = QueryDef("x10_union_types",
    """SELECT s_suppkey,
      |  CASE s_suppkey % 6
      |    WHEN 0 THEN 'https://logo' || CAST(s_suppkey AS VARCHAR) || '.example.com/a.png'
      |    WHEN 1 THEN 'https://logo' || CAST(s_suppkey AS VARCHAR) || '.example.com/id'
      |    WHEN 2 THEN 'https://logo' || CAST(s_suppkey AS VARCHAR) || '.example.com/s.png'
      |    ELSE NULL END AS logo,
      |  CASE WHEN s_suppkey % 2 = 0
      |       THEN 'https://sa' || CAST(s_suppkey AS VARCHAR) || '.example.com'
      |       ELSE 'https://a' || CAST(s_suppkey AS VARCHAR) || '|https://b' || CAST(s_suppkey AS VARCHAR) END AS same_as,
      |  CASE WHEN s_suppkey % 6 < 2 THEN 'Organization'
      |       WHEN s_suppkey % 6 < 4 THEN 'Thing|Organization'
      |       ELSE 'Article' END AS types,
      |  CASE WHEN s_suppkey % 6 < 4 THEN 'Organization'
      |       ELSE 'Article' END AS jsonld_type
      |FROM supplier""".stripMargin) { (spark, d) =>
    import graft.functions.Exprs.preferWhitelisted
    val k = col("s_suppkey").cast("string")
    val m6 = col("s_suppkey") % 6
    val typeJson = when(m6 < 2, lit("\"Organization\""))
      .when(m6 < 4, lit("""["Thing","Organization"]"""))
      .otherwise(lit("""["Article"]"""))
    val logoJson = when(m6 === 0,
        concat(lit("""{"url":"https://logo"""), k, lit(""".example.com/a.png"}""")))
      .when(m6 === 1,
        concat(lit("""{"@id":"https://logo"""), k, lit(""".example.com/id"}""")))
      .when(m6 === 2, concat(lit("\"https://logo"), k, lit(".example.com/s.png\"")))
    val sameAsJson = when(m6 % 2 === 0,
        concat(lit("\"https://sa"), k, lit(".example.com\"")))
      .otherwise(concat(lit("""["https://a"""), k,
        lit("""","https://b"""), k, lit(""""]""")))
    val node = concat(lit("""{"@type":"""), typeJson,
      when(logoJson.isNotNull, concat(lit(""","logo":"""), logoJson)).otherwise(lit("")),
      lit(""","sameAs":"""), sameAsJson, lit("}"))
    val types = PortCoPipeline.typesFromRaw(col("t_raw"))
    Tables.supplier(spark, d)
      .select(col("s_suppkey"), node.as("node"))
      .select(col("s_suppkey"),
        json_tuple(col("node"), "@type", "logo", "sameAs")
          .as(Seq("t_raw", "logo_raw", "sameas_raw")))
      .select(col("s_suppkey"),
        PortCoPipeline.logoFromRaw(col("logo_raw")).as("logo"),
        concat_ws("|", PortCoPipeline.sameAsFromRaw(col("sameas_raw"))).as("same_as"),
        concat_ws("|", types).as("types"),
        preferWhitelisted(types).as("jsonld_type"))
  }

  val all: Seq[QueryDef] = Seq(portcoE2E, portcoRanks, foundedYearE2E,
    x10UnionTypes)
}
