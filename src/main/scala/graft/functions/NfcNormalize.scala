package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

object NfcNormalizeRuntime {
  /** Unicode NFC (canonical composition). Fast path: pure-ASCII
    * bytes are NFC by definition and skip the String round-trip —
    * the overwhelmingly common case on web text. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Unicode NFC normalization as a codegen'd expression — the
  * canonical-equivalence layer text dedup needs: "é" arrives from
  * the web both composed (U+00E9) and decomposed (U+0065 U+0301),
  * HTML entity decoding and different editors disagree, and a
  * fingerprint over the raw bytes calls the two spellings different
  * documents. DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, so the layer is oracle-twin-expressible. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeRuntime.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalizeRuntime.nfc($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
