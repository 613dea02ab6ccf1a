package graft

import graft.operators.PortCoPipeline
import org.apache.spark.sql.functions._

/** The JSON-LD node Generator (`graft_jsonld_nodes`, SURVEY §2.10's
  * table-function form of `_iter_jsonld_nodes`) must agree with the
  * declarative two-stage explode it parallels. */
class JsonLdNodesSpec extends SparkSpec {
  import spark.implicits._

  private val scripts = Seq(
    // @graph flattening
    """{"@graph":[{"@type":"Organization","name":"A","url":"https://a.com"},
      |{"@type":"Person","name":"P"}]}""".stripMargin.replace("\n", ""),
    // bare array
    """[{"@type":"Organization","name":"B"},{"@type":"Thing","name":"T"}]""",
    // single object
    """{"@type":"Organization","name":"C","url":"https://c.com"}""",
    // ItemList expansion: .item preferred, bare element synthesized
    """{"@type":"ItemList","itemListElement":[
      |{"@type":"ListItem","item":{"@type":"Organization","name":"D"}},
      |{"@type":"ListItem","name":"E","url":"https://e.com"}]}""".stripMargin.replace("\n", ""),
    // string-or-list @type containing ItemList
    """{"@type":["Thing","ItemList"],"itemListElement":[{"item":{"name":"F"}}]}""",
    // garbage passes through (and is filtered by downstream field extraction)
    "not json at all")

  private def names(nodes: org.apache.spark.sql.DataFrame): Seq[String] =
    nodes.select(get_json_object(col("node"), "$.name").as("n"))
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>")).toSeq.sorted

  test("generator nodes match the declarative nodesOf + expandItemList chain") {
    val df = scripts.toDF("script")
    val gen = df.select(graft.plans.jsonLdNodes(col("script")).as("node"))
    val decl = df
      .select(explode(PortCoPipeline.nodesOf(col("script"))).as("node0"))
      .select(explode(PortCoPipeline.expandItemList(col("node0"))).as("node"))
    assert(names(gen) === names(decl))
    assert(gen.count() == decl.count())
  }

  test("SQL registration: usable as a table function in a lateral position") {
    scripts.toDF("script").createOrReplaceTempView("jsonld_scripts")
    val out = spark.sql(
      """SELECT n.node FROM jsonld_scripts
        |LATERAL VIEW graft_jsonld_nodes(script) n AS node""".stripMargin)
    assert(out.count() == 9) // 2 graph + 2 array + 1 single + 2 itemlist + 1 typed-itemlist + 1 garbage
  }

  test("generator equals declarative chain on 150 randomized scripts") {
    val rnd = new scala.util.Random(7)
    def name(): String = {
      val pool = Seq("Acme", "Øre & Søn", "株式会社テスト", "Quote\\\"d", "tab\\there", "plain")
      pool(rnd.nextInt(pool.size)) + rnd.nextInt(100)
    }
    def node(): String = {
      val sp = if (rnd.nextBoolean()) " " else ""
      s"""{$sp"@type":$sp"Organization",$sp"name":$sp"${name()}",$sp"url":$sp"https://x${rnd.nextInt(10)}.com"$sp}"""
    }
    def script(): String = rnd.nextInt(4) match {
      case 0 => s"""{ "@graph": [${Seq.fill(1 + rnd.nextInt(3))(node()).mkString(", ")}] }"""
      case 1 => s"""[ ${Seq.fill(1 + rnd.nextInt(3))(node()).mkString(" , ")} ]"""
      case 2 => node()
      case _ =>
        val items = Seq.fill(1 + rnd.nextInt(3)) {
          if (rnd.nextBoolean()) s"""{"@type":"ListItem","item":${node()}}"""
          else s"""{"@type":"ListItem","name":"${name()}"}"""
        }
        s"""{"@type":"ItemList","itemListElement":[${items.mkString(",")}]}"""
    }
    val df = Seq.fill(150)(script()).toDF("script")
    val gen = df.select(graft.plans.jsonLdNodes(col("script")).as("node"))
    val decl = df
      .select(explode(PortCoPipeline.nodesOf(col("script"))).as("node0"))
      .select(explode(PortCoPipeline.expandItemList(col("node0"))).as("node"))
    assert(gen.count() == decl.count())
    assert(names(gen) === names(decl))
    // url extraction must agree too (field-level equivalence, not just name)
    def urls(d: org.apache.spark.sql.DataFrame) =
      d.select(get_json_object(col("node"), "$.url").as("u"))
        .collect().map(r => Option(r.getString(0)).getOrElse("<null>")).toSeq.sorted
    assert(urls(gen) === urls(decl))
  }

  test("null and empty inputs yield no rows / raw pass-through") {
    val df = Seq[Option[String]](None, Some("")).toDF("script")
    val out = df.select(graft.plans.jsonLdNodes(col("script")).as("node")).collect()
    // null -> no rows; "" -> unparsable -> raw pass-through of ""
    assert(out.length == 1 && out.head.getString(0) == "")
  }
}
