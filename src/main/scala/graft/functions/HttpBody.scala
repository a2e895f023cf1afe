package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP body transfer decoding for crawl scans (r13): a large share
  * of real WARC `response` payloads carry `Content-Encoding: gzip`
  * (and some `deflate`) bodies — charset-decoding the COMPRESSED
  * bytes yields either NULL (malformed under every charset) or, far
  * worse, byte salad that happens to decode. `http_body_decode`
  * dispatches on the (column) encoding name:
  *
  *  - null / `identity` → the bytes unchanged (the common case pays
  *    one null check);
  *  - `gzip` / `x-gzip` → RFC 1952 inflate;
  *  - `deflate` → RFC 1950 zlib inflate, falling back to raw RFC 1951
  *    (the tolerant-reader norm: real servers send both under the
  *    same label — browsers sniff exactly this way);
  *  - anything else (`br`, `zstd`, `compress`, chunked leftovers) or
  *    CORRUPT bytes → NULL, loudly — one broken page must not kill a
  *    100 TB scan, and silently passing compressed bytes downstream
  *    is the mojibake failure the charset layer just closed.
  *
  * Output is capped at [[HttpBodyRuntime.MaxDecodedBytes]] — a
  * gzip bomb in a crawl must not OOM an executor; over-cap bodies
  * yield NULL (count them, like every other loud NULL here).
  *
  * `gzip_bytes` is the forward direction (fixtures, sinks) — one
  * whole-buffer member, per-JVM-deterministic like the WARC sink's
  * shard gzip (q107's foreign-validator contract).
  *
  * Static-call codegen (the [[Int32LeRuntime]] discipline). */
object HttpBodyRuntime {
  /** 64 MiB — far above any legitimate page, far below executor
    * memory. */
  val MaxDecodedBytes: Int = 64 << 20

  private def inflateStream(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > MaxDecodedBytes)
        throw new java.io.IOException("decoded body exceeds cap")
      n = in.read(buf)
    }
    out.toByteArray
  }

  def decodeOrNull(body: Array[Byte], enc: UTF8String): Array[Byte] = {
    if (body == null) return null
    val e = if (enc == null) "" else enc.toString.trim.toLowerCase(java.util.Locale.ROOT)
    e match {
      case "" | "identity" => body
      case "gzip" | "x-gzip" =>
        try inflateStream(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body), 8192))
        catch { case _: java.io.IOException => null }
      case "deflate" =>
        try inflateStream(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(body), new java.util.zip.Inflater(false), 8192))
        catch {
          case _: java.io.IOException =>
            // raw deflate (no zlib wrapper) — the other thing servers
            // ship under this label
            try inflateStream(new java.util.zip.InflaterInputStream(
              new java.io.ByteArrayInputStream(body), new java.util.zip.Inflater(true), 8192))
            catch { case _: java.io.IOException => null }
        }
      case _ => null
    }
  }

  def gzip(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out, 8192)
    gz.write(data); gz.close()
    out.toByteArray
  }
}

case class HttpBodyDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"http_body_decode expects (binary, string), got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  // null body, unknown encoding, corrupt or over-cap bytes → null
  override def nullable: Boolean = true
  override def prettyName: String = "http_body_decode"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val body = left.eval(input)
    if (body == null) null
    else HttpBodyRuntime.decodeOrNull(body.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // null encoding means identity, so only the BODY gates nullness —
    // hand-rolled instead of nullSafeCodeGen (which would null the
    // result whenever the encoding column is null)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val b = left.genCode(ctx)
    val e = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${b.code}
        ${e.code}
        boolean ${ev.isNull} = true;
        byte[] ${ev.value} = null;
        if (!${b.isNull}) {
          ${ev.value} = graft.functions.HttpBodyRuntime.decodeOrNull(
            ${b.value}, ${e.isNull} ? null : ${e.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class GzipBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gzip_bytes expects binary, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gzip_bytes"
  override protected def nullSafeEval(data: Any): Any =
    HttpBodyRuntime.gzip(data.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"${ev.value} = graft.functions.HttpBodyRuntime.gzip($d);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HttpBody {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Transfer-decode `body` per the (column) `Content-Encoding`
    * name; see [[HttpBodyRuntime.decodeOrNull]]. */
  def httpBodyDecode(body: Column, encoding: Column): Column =
    ColumnBridge.column(HttpBodyDecode(
      ColumnBridge.expression(body), ColumnBridge.expression(encoding)))
  /** Gzip `data` as one member (fixtures/sinks; per-JVM-deterministic). */
  def gzipBytes(data: Column): Column =
    ColumnBridge.column(GzipBytes(ColumnBridge.expression(data)))
}
