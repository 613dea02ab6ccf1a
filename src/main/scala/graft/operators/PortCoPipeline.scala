package graft.operators

import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Portfolio-company extraction (SURVEY.md §3.3): the reference's step-2
  * card-class classification + step-3 JSON-LD entity extraction, scoring,
  * ranking and dedup (step2_attempt1.py, step3_attempt1.py) as one
  * declarative Spark pipeline.
  *
  * Input: a page snapshot table `(firm_name, firm_url, html)` — page
  * acquisition is the connector layer's job (S4). Everything below is pure
  * column expressions + joins/windows: no UDFs, no DOM library. DOM-position
  * signals the reference reads from BeautifulSoup (e.g. "entity inside
  * card") are approximated from co-occurrence, noted inline.
  */
object PortCoPipeline {

  // ---- step 2: candidate card classes (step2_attempt1.py:21-144) ----

  /** All class attribute values in the page. */
  def classAttrs(html: Column): Column =
    regexp_extract_all(html, lit("(?i)class=\"([^\"]+)\""), lit(1))

  /** Ranked candidate card classes per firm: tokenize (X19), blacklist
    * (F11), rank A/B/C by word-subset match (X20), dedup + stable sort (A6). */
  def cardClasses(pages: DataFrame): DataFrame =
    pages.select(col("firm_name"), explode(classAttrs(col("html"))).as("cls"))
      .select(col("firm_name"), col("cls"), classTokens(col("cls")).as("tokens"))
      .filter(!classBlacklisted(col("tokens")))
      .withColumn("rank", classRank(col("tokens")))
      .filter(col("rank").isNotNull)
      .groupBy("firm_name", "rank", "cls")
      .agg(first("tokens").as("tokens"))

  // ---- step 3: JSON-LD scripts -> entity nodes (X7, X9) ----

  /** ld+json script bodies. */
  def ldJsonScripts(html: Column): Column =
    regexp_extract_all(html, lit("(?si)<script[^>]*ld\\+json[^>]*>(.*?)</script>"), lit(1))

  /** X9 part 1: a script body -> array of raw node JSON strings
    * (@graph flattening; bare arrays; single objects). */
  def nodesOf(script: Column): Column = {
    val s = trim(script)
    val graph = get_json_object(s, "$['@graph']")
    when(graph.isNotNull, from_json(graph, ArrayType(StringType)))
      .when(s.startsWith("["), from_json(s, ArrayType(StringType)))
      .otherwise(array(s))
  }

  /** X9 part 2: ItemList expansion over pre-extracted raw fields — each
    * itemListElement contributes its `.item` if present, else itself
    * (ListItem synthesis, step3_attempt1.py:137-153). */
  def expandItemListRaw(node: Column, typeRaw: Column, ileRaw: Column): Column = {
    val elems = from_json(ileRaw, ArrayType(StringType))
    when(typeRaw.isNotNull && typeRaw.contains("ItemList") && elems.isNotNull,
      transform(elems, e => coalesce(get_json_object(e, "$.item"), e)))
      .otherwise(array(node))
  }

  /** X9 part 2 on a bare node (one extra parse; entities() uses the raw
    * form fed by json_tuple). */
  def expandItemList(node: Column): Column =
    expandItemListRaw(node, get_json_object(node, "$['@type']"),
      get_json_object(node, "$.itemListElement"))

  /** X12 input: string-or-list @type (raw json value) -> array<string>. */
  def typesFromRaw(raw: Column): Column =
    when(raw.startsWith("["), from_json(raw, ArrayType(StringType)))
      .when(raw.isNotNull, array(raw))
      .otherwise(array().cast("array<string>"))

  def typesOf(node: Column): Column =
    typesFromRaw(get_json_object(node, "$['@type']"))

  /** X10: logo union type (raw json value) — object with url/@id, or bare
    * string. */
  def logoFromRaw(raw: Column): Column =
    coalesce(
      get_json_object(raw, "$.url"),
      get_json_object(raw, "$['@id']"),
      when(!raw.startsWith("{"), raw))

  def logoOf(node: Column): Column =
    logoFromRaw(get_json_object(node, "$.logo"))

  /** X11: sameAs string-or-list (raw json value) -> array<string>. */
  def sameAsFromRaw(raw: Column): Column =
    when(raw.startsWith("["), from_json(raw, ArrayType(StringType)))
      .when(raw.isNotNull, array(raw))
      .otherwise(array().cast("array<string>"))

  def sameAsOf(node: Column): Column =
    sameAsFromRaw(get_json_object(node, "$.sameAs"))

  /** Entities per firm after F8 (type gate), F10 (non-empty name), F9
    * (self-exclusion) — step3_attempt1.py:364-382.
    *
    * json_tuple parses each node string ONCE per stage (one parse for the
    * ItemList probe, one for the five entity fields) instead of one
    * get_json_object parser per field — per-row parser construction is the
    * scan-stall hazard documented at graft.plans.JsonFieldUtil, and at
    * 100 TB the JSON decode is the dominant scan cost. The union-type
    * handling (string-or-list @type/sameAs, object-or-string logo) then
    * operates on the extracted raw values. */
  def entities(pages: DataFrame): DataFrame =
    pages
      .select(col("firm_name"), col("firm_url"),
        explode(ldJsonScripts(col("html"))).as("script"))
      // graft.plans.jsonLdNodes: ONE Generate pass does @graph/array
      // flattening + ItemList expansion (the declarative nodesOf ->
      // json_tuple -> expandItemListRaw chain is kept and spec-matched;
      // the generator parses each script once on a JVM-shared mapper)
      .select(col("firm_name"), col("firm_url"),
        graft.plans.jsonLdNodes(col("script")).as("node"))
      .select(col("firm_name"), col("firm_url"), col("node"),
        json_tuple(col("node"), "@type", "name", "url", "logo", "sameAs")
          .as(Seq("t_raw", "name_raw", "url", "logo_raw", "sameas_raw")))
      .select(
        col("firm_name"), col("firm_url"), col("node"),
        typesFromRaw(col("t_raw")).as("types"),
        normText(coalesce(col("name_raw"), lit(""))).as("name"),
        col("url"),
        logoFromRaw(col("logo_raw")).as("logo"),
        sameAsFromRaw(col("sameas_raw")).as("same_as"))
      .filter(typeAllowed(col("types")))                                   // F8
      .filter(length(col("name")) > 0)                                     // F10
      .filter(!nameMatches(col("name"), col("firm_name")) &&               // F9
        !(urlDomain(col("url")) === urlDomain(col("firm_url")) &&
          nameMatches(col("name"), col("firm_name"))))
      .withColumn("jsonld_type", preferWhitelisted(col("types")))          // X12

  /** J1: score every entity against every candidate card of its firm (X14
    * weights), keep the best card per entity (W3 argmax). "inside card" has
    * no DOM position here; the A-rank card stands in for containment. */
  def scoredEntities(pages: DataFrame): DataFrame = {
    val ents = entities(pages)
    val cards = cardClasses(pages)
    val joined = ents.join(cards, Seq("firm_name"), "left")
    val score = matchScore(
      typeWl = typeWhitelisted(col("types")),
      urlDomEq = urlDomain(col("url")) === urlDomain(col("firm_url")),
      logoDomHit = urlDomain(col("logo")) === urlDomain(col("firm_url")),
      nameMatch = exists(coalesce(col("tokens"), array().cast("array<string>")),
        t => lower(col("name")).contains(t)),
      inside = coalesce(col("rank") === "A", lit(false)))
    val w = Window.partitionBy("firm_name", "name", "url")
      .orderBy(col("sc").desc, col("cls").asc_nulls_last)
    joined.withColumn("sc", round(score, 3))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("firm_name"), col("name"), col("url"), col("jsonld_type"),
        col("logo"), col("same_as"), col("sc").as("score"),
        col("cls").as("matched_class"))
  }

  /** Full step-3 result: keep >= 1.2, rank A at >= 1.8 (thresholds at
    * step3_attempt1.py:415,426), W2 dedup on (lower(name), url domain)
    * keeping the highest score, O1 ordering (score desc, name asc). */
  def portcos(pages: DataFrame): DataFrame = {
    val scored = scoredEntities(pages).filter(col("score") >= 1.2)
    val w = Window.partitionBy(lower(col("name")), urlDomain(col("url")))
      .orderBy(col("score").desc, lower(col("name")))
    scored
      .withColumn("rank", when(col("score") >= 1.8, "A").otherwise("B"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .orderBy(col("score").desc, lower(col("name")))
  }

  /** A4: nested per-firm document (main_portCo.py:113-122). */
  def nestedResult(pages: DataFrame): DataFrame =
    portcos(pages)
      .groupBy("firm_name")
      .agg(sort_array(collect_list(struct(
        col("name"), col("url"), col("jsonld_type"), col("score"), col("rank"))))
        .as("portcos"))
}
