package graft

import graft.operators.PortCoPipeline
import org.apache.spark.sql.functions._

/** End-to-end portCo extraction on synthetic firm pages exercising every
  * branch: @graph flattening, ItemList expansion, union-typed fields,
  * type white/blacklists, self-exclusion, scoring, thresholding, dedup. */
class PortCoPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val acmeHtml =
    """<html><body>
      |<div class="portfolio card"><img src="https://www.acme.com/uploads/Hygain-Holdings-412x412.jpg" alt="Hygain Holdings"><span>cards</span></div>
      |<div class="site-footer portfolio"><span>noise</span></div>
      |<script type="application/ld+json">
      |{"@graph":[
      |  {"@type":"Organization","name":"Acme Capital","url":"https://www.acme.com"},
      |  {"@type":["Organization","Brand"],"name":"Hygain Holdings","url":"https://hygain.com.au",
      |   "logo":{"url":"https://www.acme.com/uploads/Hygain-Holdings-412x412.jpg"}},
      |  {"@type":"Person","name":"Jane Founder"},
      |  {"@type":"WebPage","name":"Our Portfolio"}
      |]}
      |</script>
      |<script type="application/ld+json">
      |{"@type":"ItemList","itemListElement":[
      |  {"@type":"ListItem","item":{"@type":"Organization","name":"Be Campbell","url":"https://becampbell.com.au","sameAs":"https://linkedin.com/bc"}},
      |  {"@type":"Organization","name":"Riverlands","url":"https://riverlands.example"}
      |]}
      |</script>
      |</body></html>""".stripMargin

  private def pages = Seq(
    ("Acme Capital", "https://www.acme.com", acmeHtml)
  ).toDF("firm_name", "firm_url", "html")

  test("card classes: rank A kept, footer noise blacklisted") {
    val cards = PortCoPipeline.cardClasses(pages).collect()
    assert(cards.exists(r => r.getString(2) == "portfolio card" && r.getString(1) == "A"))
    assert(!cards.exists(_.getString(2).contains("footer")))
  }

  test("entities: graph flattened, ItemList expanded, Person/WebPage dropped, self excluded") {
    val ents = PortCoPipeline.entities(pages)
    val names = ents.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("Hygain Holdings", "Be Campbell", "Riverlands"))
    // union types normalized
    val hygain = ents.filter($"name" === "Hygain Holdings").collect().head
    assert(hygain.getAs[String]("jsonld_type") == "Organization")
    // sameAs string normalized to array
    val bc = ents.filter($"name" === "Be Campbell").collect().head
    assert(bc.getSeq[String](bc.fieldIndex("same_as")) == Seq("https://linkedin.com/bc"))
  }

  test("scoring: whitelist + card img-domain + alt name hint put Hygain at rank A") {
    val out = PortCoPipeline.portcos(pages).collect()
    val byName = out.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName.contains("Hygain Holdings"))
    // typeWL 1.0 + logo domain = card img domain 0.6 + alt-hint nameMatch 0.7
    // = 2.3 >= 1.8 -> rank A
    assert(byName("Hygain Holdings").getAs[String]("rank") == "A")
    assert(byName("Hygain Holdings").getAs[Double]("score") == 2.3)
    // Be Campbell / Riverlands: org-like but no card signal -> weak rank C
    // at the raw type score (step3_attempt1.py:447-469)
    assert(byName("Be Campbell").getAs[String]("rank") == "C")
    assert(byName("Be Campbell").getAs[Double]("score") == 1.0)
    assert(byName("Riverlands").getAs[String]("rank") == "C")
    // matched_by provenance: computed reasons for the chosen card on A/B,
    // the reference's fixed ["type_whitelist"] on the C/D fallbacks
    val hy = byName("Hygain Holdings")
    assert(hy.getSeq[String](hy.fieldIndex("matched_by")) ==
      Seq("type_whitelist", "logo_domain_match", "name_match"))
    val bc = byName("Be Campbell")
    assert(bc.getSeq[String](bc.fieldIndex("matched_by")) == Seq("type_whitelist"))
    // ordering: scores non-increasing
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("X22: the name hint decides which card an entity matches") {
    // two rank-A cards; the one whose img alt matches the entity name LOSES
    // the alphabetical class tiebreak, so only the 0.7 hint term can pick it
    val html =
      """<div class="portfolio item"><img alt="Zeta Corp"></div>
        |<div class="investment box">plain</div>
        |<script type="application/ld+json">{"@type":"Organization","name":"Zeta Corp","url":"https://zeta.example"}</script>
        |""".stripMargin
    val p = Seq(("F Cap", "https://www.fcap.example", html))
      .toDF("firm_name", "firm_url", "html")
    val out = PortCoPipeline.portcos(p).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("matched_class") == "portfolio item")
    assert(out.head.getAs[Double]("score") == 1.7) // 1.0 type + 0.7 hint
    assert(out.head.getAs[String]("rank") == "B")
  }

  test("X14 fallback ranks: C for weak-scored org-like, D when no card exists") {
    val scriptC =
      """<div class="portfolio">x</div>
        |<script type="application/ld+json">{"@type":"Organization","name":"Weak Co","url":"https://weak.example"}</script>""".stripMargin
    val scriptD =
      """<p>no classed elements at all</p>
        |<script type="application/ld+json">{"@graph":[
        |  {"@type":"Organization","name":"Orphan Co","url":"https://orphan.example"},
        |  {"@type":"Product","name":"Not Org"}]}</script>""".stripMargin
    val p = Seq(
      ("C Firm", "https://www.cfirm.example", scriptC),
      ("D Firm", "https://www.dfirm.example", scriptD)
    ).toDF("firm_name", "firm_url", "html")
    val out = PortCoPipeline.portcos(p).collect()
    val byName = out.map(r => r.getAs[String]("name") -> r).toMap
    // card present, score 1.0 < 1.2, whitelisted type -> C, raw score kept
    assert(byName("Weak Co").getAs[String]("rank") == "C")
    assert(byName("Weak Co").getAs[Double]("score") == 1.0)
    // no card on the page, whitelisted type -> D, score forced to 0.0
    assert(byName("Orphan Co").getAs[String]("rank") == "D")
    assert(byName("Orphan Co").getAs[Double]("score") == 0.0)
    // non-whitelisted entity with no card match drops entirely
    assert(!byName.contains("Not Org"))
  }

  test("attempt2: first present tag kind decides the method for the whole card") {
    val html =
      """<div class="portfolio card"><a href="/x"><span>Alpha</span> Co</a><img alt="IgnoredAlt"><figcaption>IgnoredCap</figcaption></div>
        |<div class="logo"><img alt="Beta Co"><figcaption>IgnoredCap</figcaption></div>""".stripMargin
    val p = Seq(("F", "https://f.example", html)).toDF("firm_name", "firm_url", "html")
    val out = PortCoPipeline.attempt2(p).collect()
    assert(out.length == 2, out.mkString("\n"))
    val byName = out.map(r => r.getAs[String]("name") -> r).toMap
    // anchors present -> img alt and figcaption ignored; nested tags stripped
    assert(byName("Alpha Co").getAs[String]("extraction_rank") == "A")
    assert(byName("Alpha Co").getAs[Int]("step3_method") == 1)
    // no anchor -> img alt; low-ranked class -> E
    assert(byName("Beta Co").getAs[String]("extraction_rank") == "E")
    assert(byName("Beta Co").getAs[Int]("step3_method") == 2)
  }

  test("W2 dedup breaks a complete rank-D tie deterministically") {
    // two same-named org nodes, same domain, different paths, NO card on
    // the page: both rows are rank D / score 0.0 / null matched_class —
    // without the (url, name) tail in the min_by ordering the survivor
    // would be arbitrary
    val html =
      """<p>no cards</p><script type="application/ld+json">{"@graph":[
        |{"@type":"Organization","name":"Dup Co","url":"https://a.example/x"},
        |{"@type":"Organization","name":"Dup Co","url":"https://a.example/y"}]}</script>""".stripMargin
    val p = Seq(("F", "https://f.example", html)).toDF("firm_name", "firm_url", "html")
    val out = PortCoPipeline.portcos(p).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("rank") == "D")
    assert(out.head.getAs[String]("url") == "https://a.example/x",
      "tie must resolve to the least (url, name)")
  }

  test("W2 dedup keeps one row per (name, domain) with the best score") {
    val twice = pages.union(pages) // same page seen twice -> duplicate entities
    val out = PortCoPipeline.portcos(twice)
    val grouped = out.groupBy(lower($"name")).count().filter($"count" > 1).count()
    assert(grouped == 0)
  }

  test("nested A4 document collects portcos per firm") {
    val doc = PortCoPipeline.nestedResult(pages).collect().head
    assert(doc.getAs[String]("firm_name") == "Acme Capital")
    val portcos = doc.getSeq[org.apache.spark.sql.Row](1)
    assert(portcos.map(_.getString(0)).contains("Hygain Holdings"))
  }
}
