package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Per-group top-k as an aggregate with BOUNDED state — the 100 TB
  * alternative to the `row_number() OVER (PARTITION BY key ORDER BY ...)
  * <= k` form. The window form shuffles and SORTS every row of every key
  * to keep k of them; this aggregate holds at most k struct rows per
  * group, Spark partial-aggregates it map-side (each task ships <= k rows
  * per group, not the group's row count), and merge concatenates + trims.
  * For a skewed key with 10^9 rows the window sorts 10^9; this keeps k.
  *
  * Ordering: DESCENDING lexicographic on the child struct's fields — rank
  * fields first, unique tie-breaker last, exactly the determinism contract
  * the declared queries already follow (negate a field to flip its
  * direction). Returns the top-k structs as a DESC-sorted array;
  * explode + inline turns it back into rows.
  *
  * State is an insertion-sorted Array[UnsafeRow] (k is small; binary
  * search + arraycopy beats a heap at these sizes and keeps eval free),
  * serialized as length-prefixed UnsafeRow bytes. */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[UnsafeRow]]
  with UnaryLike[Expression] {

  require(k >= 1, "graft_top_k needs k >= 1")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a struct of orderable fields, got ${t.simpleString}")
  }

  /** Ascending struct ordering; the buffer is kept sorted DESCENDING by
    * inserting before the first smaller element. */
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(structType)

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  type Buf = java.util.ArrayList[UnsafeRow]

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  /** Insert maintaining DESC order; drop below index k. */
  private def insert(buf: Buf, row: UnsafeRow): Unit = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(buf.get(mid), row) >= 0) lo = mid + 1 else hi = mid
    }
    if (lo < k) {
      buf.add(lo, row)
      if (buf.size > k) buf.remove(k)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) insert(buf, toUnsafe(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var total = 4
    val it = buf.iterator()
    while (it.hasNext) total += 4 + it.next().getSizeInBytes
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it2 = buf.iterator()
    while (it2.hasNext) {
      val r = it2.next()
      val bytes = r.getBytes
      bb.putInt(bytes.length).put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(math.max(n, k + 1))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}
