package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Weighted Misra-Gries heavy-hitters summary as a
  * `TypedImperativeAggregate` — the third UDAF kind on the engine's §2.10
  * surface (typed `Aggregator` = ConsensusYear, Catalyst `Generator` =
  * JsonLdNodes, and now an imperative aggregate with a serialized
  * mergeable buffer).
  *
  * Semantics: maintain at most `k` (item, counter) slots over a weighted
  * item stream. A hit adds the weight to the slot; a miss with a free slot
  * claims one; a miss with a full table decrements EVERY counter (and the
  * incoming weight) by the same amount — the charging argument that bounds
  * total decrement per slot by W/(k+1), where W is total stream weight.
  * `merge` sums two summaries and, if over k slots, subtracts the
  * (k+1)-largest counter from all — the Agarwal/Cormode/Huang/Phillips/
  * Wei/Yi mergeable-summaries merge, which preserves the same W/(k+1)
  * error bound under ARBITRARY merge trees. That invariance is the whole
  * point at 100 TB: Spark may partial-aggregate per partition, shuffle
  * O(k) longs per partition (never the vocabulary), and merge in any
  * order, and every item with true weight > W/(k+1) is still GUARANTEED a
  * surviving slot. The candidate SET beyond that guarantee is
  * merge-order-dependent (deliberately so — it's a sketch), which is why
  * the declared query emits only the guaranteed facts (see
  * TextAnalysis.taHeavyHitters).
  *
  * Buffer is a primitive-boxed HashMap serialized as (n, key, value)*
  * longs; update cost is O(1) on hit and O(k) on miss-with-full-table
  * (k is small — the summary is meant to fit in a cache line or two).
  */
case class MisraGriesTopK(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k >= 1, "graft_mg_topk needs k >= 1")

  override def left: Expression = child
  override def right: Expression = weight

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint item, bigint weight), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf(k * 2)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val x = child.eval(input)
    val w = weight.eval(input)
    if (x == null || w == null) return buf
    val item = x.asInstanceOf[Long]
    var wt = w.asInstanceOf[Long]
    if (wt <= 0) return buf
    val cur = buf.get(item)
    if (cur != null) { buf.put(item, cur + wt); return buf }
    if (buf.size < k) { buf.put(item, wt); return buf }
    // miss with a full table: decrement everything (and the newcomer) by
    // min(newcomer, smallest counter); zeroed slots free up for the
    // newcomer's remainder
    var m = Long.MaxValue
    val vi = buf.values().iterator()
    while (vi.hasNext) { val v = vi.next().longValue(); if (v < m) m = v }
    val d = math.min(wt, m)
    val ei = buf.entrySet().iterator()
    while (ei.hasNext) {
      val e = ei.next()
      val v = e.getValue.longValue() - d
      if (v <= 0) ei.remove() else e.setValue(v)
    }
    wt -= d
    if (wt > 0) buf.put(item, wt)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val oi = other.entrySet().iterator()
    while (oi.hasNext) {
      val e = oi.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-largest counter from all; at most k survive
      val vals = new Array[Long](buf.size)
      var i = 0
      val vi = buf.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (k + 1))
      val ei = buf.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val v = e.getValue.longValue() - d
        if (v <= 0) ei.remove() else e.setValue(v)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val ki = buf.keySet().iterator()
    while (ki.hasNext) { out(i) = ki.next().longValue(); i += 1 }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val ei = buf.entrySet().iterator()
    while (ei.hasNext) {
      val e = ei.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(math.max(k * 2, n * 2))
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesTopK =
    copy(child = newLeft, weight = newRight)
}
