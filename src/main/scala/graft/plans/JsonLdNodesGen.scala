package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared, thread-safe Jackson mapper: constructed ONCE per JVM. Per-row
  * parser/mapper construction is the scan-stall hazard documented at
  * [[JsonFieldUtil]]; an ObjectMapper is safe for concurrent `readTree`. */
object JsonLdNodesGen {
  val mapper = new ObjectMapper()
}

/** `graft_jsonld_nodes(script)`: the reference's `_iter_jsonld_nodes`
  * generator (step3_attempt1.py:86-153) as a Catalyst [[Generator]] — the
  * SQL-callable table-function form SURVEY §2.10 reserves for exactly this
  * operator. Per script tag it yields 0..n entity-node rows:
  *
  *  1. an object with an `@graph` array flattens to its elements;
  *     a bare top-level array to its elements; anything else is one node
  *     (unparsable input passes through raw — downstream field extraction
  *     nulls it out, mirroring the declarative path's F10 filtering);
  *  2. a node whose raw `@type` contains "ItemList" and that carries an
  *     `itemListElement` array expands to each element's `.item` if
  *     present, else the element itself (ListItem synthesis).
  *
  * Emitted nodes are compact-serialized JSON strings, the same shape
  * `from_json(…, array<string>)` yields in the declarative pipeline
  * (PortCoPipeline.nodesOf / expandItemListRaw) — equivalence is
  * spec-asserted on the synthesized corpus. One GenerateExec pass replaces
  * two explode stages; the mapper is JVM-shared, so the per-row cost is one
  * `readTree`, not a parser construction. */
case class JsonLdNodes(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("node", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_jsonld_nodes expects string, got ${t.simpleString}")
  }

  private def row(s: String): InternalRow =
    InternalRow(UTF8String.fromString(s))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val s = v.toString.trim
    val root: JsonNode =
      try JsonLdNodesGen.mapper.readTree(s)
      catch { case _: Exception => null }
    if (root == null) return Seq(row(s)) // raw pass-through, filtered downstream

    import scala.jdk.CollectionConverters._
    val top: Seq[JsonNode] =
      if (root.isObject && root.has("@graph") && root.get("@graph").isArray)
        root.get("@graph").elements().asScala.toSeq
      else if (root.isArray) root.elements().asScala.toSeq
      else Seq(root)

    top.flatMap { n =>
      val isItemList = n.isObject && n.has("@type") &&
        n.get("@type").toString.contains("ItemList")
      if (isItemList && n.has("itemListElement") && n.get("itemListElement").isArray) {
        n.get("itemListElement").elements().asScala.toSeq.map { e =>
          val item = if (e.isObject && e.has("item")) e.get("item") else e
          row(item.toString)
        }
      } else Seq(row(n.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
