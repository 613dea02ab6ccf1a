package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §7.2's
  * "custom work only where it pays"): a fused dot product that walks the two
  * `ArrayData` buffers in a tight loop inside whole-stage codegen.
  *
  * The declarative twin `aggregate(zip_with(a, b, _*_), 0, _+_)` is
  * semantically identical but materializes the element-wise product array
  * and evaluates two lambdas per element; on a 100 TB ANN scan the fused
  * loop removes one array allocation + 2n lambda dispatches per pair.
  * [[RewriteDotProduct]] turns the declarative form into this one, so query
  * authors keep writing the portable shape.
  */
abstract class ArrayDotBase extends BinaryExpression {
  protected def elemType: DataType

  /** Length mismatch yields NULL — mirrors the declarative
    * aggregate(zip_with(...)) form, where zip_with pads the shorter array
    * with NULLs and the Add folds the result to NULL. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _)) if l == elemType && r == elemType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<${elemType.simpleString}> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** Exact dot product of two `array<bigint>` vectors (quantized embeddings):
  * `graft_dot_q(a, b) = sum_i a[i]*b[i]` over the common prefix. */
case class DotProductQ(left: Expression, right: Expression) extends ArrayDotBase {
  override protected def elemType: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Double-accumulated dot product of two `array<float>` embedding vectors
  * (sequential fold order — same result as the declarative double path). */
case class DotProductF(left: Expression, right: Expression) extends ArrayDotBase {
  override protected def elemType: DataType = FloatType
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
