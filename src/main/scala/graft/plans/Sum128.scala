package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact integer sum of a bigint column into DECIMAL(38,0), accumulated in
  * TWO LONGS instead of a BigDecimal (round 17, guide §4 "eliminate
  * non-codegen work in the hot path"): `sum(cast(x as decimal(38,0)))` keeps
  * a JavaBigDecimal in the agg buffer — every row allocates — because a
  * decimal wider than 18 digits never fits Spark's compact long
  * representation in an UnsafeRow buffer. This aggregate keeps the running
  * sum as `hi · 2⁶¹ + lo` (both longs, `lo ∈ [0, 2⁶¹)`), so update and merge
  * are a handful of codegen'd long ops on a primitive (mutable, fixed-width)
  * buffer, and the DECIMAL materializes once per GROUP at evaluate.
  *
  * Exactness contract (the caller must prove both; [[Sum128]] is for sums
  * whose per-row terms fit a long but whose TOTALS do not):
  *   - |per-row value| ≤ 2⁶² — the update's `lo + x` then stays inside
  *     (−2⁶³, 2⁶³) against the `lo < 2⁶¹` invariant, and the Pmod/div carry
  *     fold is exact for either sign;
  *   - |true total| < 2⁶¹·(2⁶³−1) ≈ 2.1·10³⁷ — `hi` itself must not wrap.
  *     At a 100 TB corpus' ~10¹² rows of ≤1.3·10¹⁴ moments the total is
  *     ~10²⁶, eleven orders inside the bound (and DECIMAL(38,0) holds it).
  *
  * Null semantics match SQL SUM: null inputs are skipped; a group with no
  * non-null input evaluates to NULL (the `seen` flag, not a sentinel).
  * Merge order is irrelevant (integer addition commutes; the carry fold is
  * associative on the hi/lo representation), so partial aggregation and AQE
  * coalescing cannot change the result — the same order-independence
  * argument as the engine's other integer-exact statistics. */
case class Sum128(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sum128 requires a BIGINT child (per-row values must provably fit a long), got $other")
    }
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "sum128"

  /** lo lives in [0, B); carries move multiples of B into hi. 2⁶¹ (not
    * 2⁶²) so merge's `lo.left + lo.right` and update's `lo + x` both stay
    * strictly inside the long range. */
  private val B = 1L << 61

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** (hi', lo') after folding `loSum` (any long) into the invariant:
    * lo' = loSum mod B ∈ [0, B), carry = (loSum − lo') / B exactly —
    * Pmod gives the floor-mod for either sign, and the subtraction makes
    * the division exact, so truncating IntegralDivide equals floor. */
  private def fold(hiE: Expression, loSum: Expression)
      : (Expression, Expression) = {
    val newLo = Pmod(loSum, Literal(B))
    val carry = IntegralDivide(Subtract(loSum, newLo), Literal(B))
    (Add(hiE, carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val (h2, l2) = fold(hi, Add(lo, child))
    Seq(
      If(IsNull(child), hi, h2),
      If(IsNull(child), lo, l2),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // both los are in [0, B) ⇒ their sum is in [0, 2B) ⊂ [0, 2⁶²): no
    // overflow, and the same fold restores the invariant
    val (h2, l2) = fold(Add(hi.left, hi.right), Add(lo.left, lo.right))
    Seq(h2, l2, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    val dec = DecimalType(38, 0)
    val total = Add(
      Multiply(Cast(hi, dec), Cast(Literal(B), dec)),
      Cast(lo, dec))
    If(seen, Cast(total, dec), Literal(null, dec))
  }

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}
