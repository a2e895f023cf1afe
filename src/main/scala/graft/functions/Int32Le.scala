package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `int32_le(array<int>) -> binary`: the token-id binarization step —
  * a packed sequence of ids becomes the little-endian int32 byte run
  * a training loader memory-maps (the `.bin` convention of GPT-style
  * data pipelines). A native expression (the [[DeflateRatio]]
  * static-call discipline) so a 100 TB tokenize-and-ship job stays
  * inside whole-stage codegen; output length is exactly `4·n`, which
  * is what lets q104 oracle the export by size. Null array → null;
  * null ELEMENTS are rejected loudly (a silent 0 id would corrupt
  * training data). */
object Int32LeRuntime {
  def pack(ids: ArrayData): Array[Byte] = {
    if (ids == null) return null
    val n = ids.numElements()
    val out = new Array[Byte](4 * n)
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i))
        throw new IllegalArgumentException(s"int32_le: null id at position $i")
      val v = ids.getInt(i)
      val o = 4 * i
      out(o) = v.toByte
      out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte
      out(o + 3) = (v >> 24).toByte
      i += 1
    }
    out
  }
}

case class Int32Le(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"int32_le expects array<int>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "int32_le"
  override protected def nullSafeEval(ids: Any): Any =
    Int32LeRuntime.pack(ids.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int32LeRuntime.pack($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int32Le {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column builder. */
  def int32le(ids: Column): Column =
    ColumnBridge.column(Int32Le(ColumnBridge.expression(ids)))
}
