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

  test("null and empty inputs yield no rows / raw pass-through") {
    val df = Seq[Option[String]](None, Some("")).toDF("script")
    val out = df.select(graft.plans.jsonLdNodes(col("script")).as("node")).collect()
    // null -> no rows; "" -> unparsable -> raw pass-through of ""
    assert(out.length == 1 && out.head.getString(0) == "")
  }
}
