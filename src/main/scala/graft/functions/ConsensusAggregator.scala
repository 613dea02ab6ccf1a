package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF form of the consensus rule (SURVEY.md §2.10: reference
  * `consensus_year`, founded_year.py:203-217): per key, collect each
  * method's candidate-year set; if the intersection of every contributing
  * method's set is non-empty the consensus is its minimum, else None.
  *
  * The relational twin ([[graft.operators.FoundedYear.consensus]]) is what
  * the declared queries use — partial aggregation and codegen come free
  * there. This Aggregator exists for the typed Dataset API surface:
  * reusable via `groupByKey(...).agg(ConsensusYear.toColumn)` and
  * registerable with `spark.udf.register("consensus_year",
  * functions.udaf(ConsensusYear))`. Buffers are mergeable maps, so Spark
  * still performs map-side partial aggregation. */
object ConsensusYear extends Aggregator[MethodYear, Map[String, Set[Int]], Option[Int]] {

  override def zero: Map[String, Set[Int]] = Map.empty

  override def reduce(b: Map[String, Set[Int]], a: MethodYear): Map[String, Set[Int]] =
    b.updated(a.method, b.getOrElse(a.method, Set.empty[Int]) + a.year)

  override def merge(b1: Map[String, Set[Int]], b2: Map[String, Set[Int]]): Map[String, Set[Int]] =
    (b1.keySet ++ b2.keySet).iterator
      .map(k => k -> (b1.getOrElse(k, Set.empty[Int]) ++ b2.getOrElse(k, Set.empty[Int])))
      .toMap

  override def finish(b: Map[String, Set[Int]]): Option[Int] =
    if (b.isEmpty) None
    else {
      val inter = b.values.reduce(_ intersect _)
      if (inter.isEmpty) None else Some(inter.min)
    }

  override def bufferEncoder: Encoder[Map[String, Set[Int]]] =
    Encoders.kryo[Map[String, Set[Int]]]

  override def outputEncoder: Encoder[Option[Int]] = ExpressionEncoder[Option[Int]]()
}

/** One method/year observation for a key (the typed long-table row). */
case class MethodYear(method: String, year: Int)
