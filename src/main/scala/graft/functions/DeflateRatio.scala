package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio runtime for the quality signal: DEFLATE the
  * UTF-8 bytes at the given level and return compressed/raw length.
  * Highly repetitive or templated text compresses far below ~0.4;
  * natural prose sits near 0.5–0.7; random bytes exceed 1 (deflate
  * overhead) — the standard cheap "is this text degenerate" probe
  * (CCNet/RefinedWeb-style pipelines use exactly this shape).
  *
  * One `Deflater` per call, `end()`ed in finally — Deflater holds
  * native zlib memory, and leaking it across a 100 TB scan OOMs the
  * executor long before the heap notices. Output depends only on the
  * input bytes and the JVM's zlib, so the value is deterministic
  * within a cluster (all executors share the JVM build) but NOT
  * across engines — this signal is spec'd and gated rows-only, never
  * hash-oracled.
  */
object DeflateRuntime {
  def ratio(text: UTF8String, level: Int): Double = {
    if (text == null) return -1.0
    val raw = text.getBytes
    if (raw.length == 0) return 0.0
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length.toDouble
    } finally d.end()
  }
}

/** `deflate_ratio(text)`: compressed-size / raw-size at zlib level 6.
  * A native unary Expression with `doGenCode` (static call — stays
  * inside the whole-stage span; the work is the deflate itself, not
  * the call boundary). */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio expects string, got ${child.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(text: Any): Any =
    DeflateRuntime.ratio(text.asInstanceOf[UTF8String], 6)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DeflateRuntime.ratio($t, 6);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
