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

  /** Synthetic page per supplier: one A-rank card + one Organization node.
    * Expected per supplier: that portco at score 1.0 (type whitelist) + 0.3
    * (inside A card) = 1.3, rank B. */
  val portcoE2E = QueryDef("pipe_portco_e2e",
    """SELECT s_name AS firm_name,
      |  'PortCo ' || CAST(s_suppkey AS VARCHAR) AS name,
      |  'https://pc' || CAST(s_suppkey AS VARCHAR) || '.example.com' AS url,
      |  'Organization' AS jsonld_type,
      |  CAST(1.3 AS DOUBLE) AS score,
      |  'B' AS rank
      |FROM supplier""".stripMargin) { (spark, d) =>
    val html = concat(
      lit("""<div class="portfolio card"></div><script type="application/ld+json">{"@graph":[{"@type":"Organization","name":"PortCo """),
      col("s_suppkey").cast("string"),
      lit("""","url":"https://pc"""),
      col("s_suppkey").cast("string"),
      lit(""".example.com"}]}</script>"""))
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

  val all: Seq[QueryDef] = Seq(portcoE2E, foundedYearE2E)
}
