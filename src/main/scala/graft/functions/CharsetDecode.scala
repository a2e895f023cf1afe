package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `charset_decode(binary, charset) -> string`: crawl-grade charset
  * decoding. Spark's own `decode` is the wrong tool for a 100 TB WARC
  * scan twice over: its non-legacy whitelist is 7 charsets (a declared
  * `gbk` THROWS `INVALID_PARAMETER_VALUE` at runtime — most of the
  * non-Western web would kill the scan), and even under
  * `spark.sql.legacy.javaCharsets` malformed bytes throw
  * `MALFORMED_CHARACTER_CODING` (one broken page kills the segment).
  * This expression decodes by a WHITELISTED alias table of real-web
  * charset names (declared-name spellings → canonical JVM charsets,
  * availability-checked at class load) with `CodingErrorAction.REPORT`
  * and returns NULL for an unknown alias or malformed bytes — loud
  * (count the nulls per segment), never mojibake from byte salad,
  * never a dead executor. The charset operand is a COLUMN, not a
  * literal, so one expression serves every declared charset — no
  * 25-branch when-chain (the janino k-way lesson) and no decoder
  * branch that analysis never type-checked.
  *
  * What it cannot do: detect a LYING declaration (UTF-8 bytes under a
  * `shift_jis` label often decode "successfully" into katakana
  * salad). That is inherent to declared-charset decoding — CCNet
  * inherits the same failure — and is why the langid + quality gates
  * downstream exist.
  *
  * Static-call codegen (the [[Int32LeRuntime]]/DeflateRatio
  * discipline) keeps the projection inside whole-stage codegen. */
object CharsetDecodeRuntime {
  /** Declared-name spellings seen in real crawl Content-Type headers,
    * lowercased, → canonical JVM charset names. Filtered by JVM
    * availability at load (extended charsets live in `jdk.charsets`,
    * present in full JDKs; a JRE without one simply treats its
    * aliases as unknown → NULL, the loud path). */
  val Aliases: Map[String, String] = {
    val raw: Seq[(String, String)] =
      Seq("utf-8" -> "UTF-8", "utf8" -> "UTF-8",
        "us-ascii" -> "US-ASCII", "ascii" -> "US-ASCII",
        "utf-16" -> "UTF-16", "utf-16le" -> "UTF-16LE",
        "utf-16be" -> "UTF-16BE",
        "iso-8859-1" -> "ISO-8859-1", "iso8859-1" -> "ISO-8859-1",
        "latin-1" -> "ISO-8859-1", "latin1" -> "ISO-8859-1",
        "gbk" -> "GBK", "gb2312" -> "GBK", "x-gbk" -> "GBK",
        "gb18030" -> "GB18030",
        "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS",
        "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS",
        "euc-jp" -> "EUC-JP", "x-euc-jp" -> "EUC-JP",
        "euc-kr" -> "EUC-KR", "ksc_5601" -> "EUC-KR",
        "ks_c_5601-1987" -> "EUC-KR",
        "big5" -> "Big5", "big5-hkscs" -> "Big5-HKSCS",
        "koi8-r" -> "KOI8-R", "koi8-u" -> "KOI8-U",
        "tis-620" -> "TIS-620", "windows-874" -> "x-windows-874") ++
        (2 to 11).map(i => s"iso-8859-$i" -> s"ISO-8859-$i") ++
        Seq("iso-8859-13" -> "ISO-8859-13", "iso-8859-15" -> "ISO-8859-15",
          "latin2" -> "ISO-8859-2") ++
        (0 to 8).flatMap { i =>
          Seq(s"windows-125$i" -> s"windows-125$i", s"cp125$i" -> s"windows-125$i")
        }
    raw.filter { case (_, jvm) =>
      try Charset.isSupported(jvm) catch { case _: Exception => false }
    }.toMap
  }

  def decodeOrNull(bytes: Array[Byte], cs: UTF8String): UTF8String = {
    if (bytes == null || cs == null) return null
    val canon = Aliases.getOrElse(cs.toString.toLowerCase(Locale.ROOT), null)
    if (canon == null) return null
    try {
      val dec = Charset.forName(canon).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch { case _: CharacterCodingException => null }
  }
}

case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"charset_decode expects (binary, string), got ($l, $r)")
    }
  override def dataType: DataType = StringType
  // null for null inputs AND for unknown-charset / malformed bytes
  override def nullable: Boolean = true
  override def prettyName: String = "charset_decode"
  override protected def nullSafeEval(bytes: Any, cs: Any): Any =
    CharsetDecodeRuntime.decodeOrNull(
      bytes.asInstanceOf[Array[Byte]], cs.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"""${ev.value} = graft.functions.CharsetDecodeRuntime.decodeOrNull($b, $c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharsetDecode {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column builder: decode `bytes` by the charset NAMED IN `cs`
    * (a column — per-row charsets, the declared-envelope use case). */
  def charsetDecode(bytes: Column, cs: Column): Column =
    ColumnBridge.column(CharsetDecode(
      ColumnBridge.expression(bytes), ColumnBridge.expression(cs)))
}
