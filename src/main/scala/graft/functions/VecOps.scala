package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels as native Catalyst expressions.
  *
  * [[graft.operators.Similarity]]'s dot product was composed from
  * `aggregate(zip_with(a, b, x·y), 0.0, +)` — semantically right, but
  * Spark's higher-order functions are CodegenFallback: every row pays
  * interpreted lambda dispatch and an allocated intermediate array,
  * and the expression breaks the WholeStageCodegen span. [[VecDot]]
  * is the custom-Expression upgrade (the same ladder rung as
  * [[Uint256Exact]]): one static-call `doGenCode` into a tight
  * primitive loop, bit-identical arithmetic (left-to-right double
  * accumulation over exactly-widened elements), identical null
  * semantics (length mismatch or a null element → null — what
  * zip_with's null padding and `acc + null` produce), so every
  * DuckDB oracle twin stays hash-equal while the hot loop drops the
  * interpreter.
  */
object VecRuntime {
  /** Left-to-right double-accumulated dot product; null boxes the
    * zip_with/aggregate null semantics. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pads with null → null sum
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float|double>, array<float|double>), " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecRuntime.dot(
         |  $a, $b, $leftIsFloat, $rightIsFloat);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
