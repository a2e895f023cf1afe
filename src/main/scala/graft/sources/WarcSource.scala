package graft.sources

import graft.SerializableHadoopConf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for WARC shard directories (ISO 28500 — the
  * Common Crawl interchange format), the consuming half of
  * [[graft.sinks.WarcShards]] and a reader for FOREIGN WARC/WET
  * files too. `spark.read.format("graft.sources.WarcSource")
  * .option("path", dir).load()` yields `(shard, record_id,
  * warc_type, target_uri, content_type, content_length, payload)`
  * rows, one per WARC record.
  *
  * ONE partition per `.warc[.gz]` file; each task streams its file's
  * records sequentially (Common Crawl shards are ~1 GB — the same
  * per-file granularity its own tooling uses). All I/O rides the
  * Hadoop `FileSystem` API ([[graft.SerializableHadoopConf]] ships
  * the conf), so `hdfs://`/`s3a://`/`file:` inputs all work.
  *
  * Column pruning is real I/O here, twice over:
  *  - Sequential path: when `payload` is pruned, payload bytes are
  *    inflated into a scratch buffer and discarded — no per-record
  *    allocation, nothing record-sized retained.
  *  - cdx fast path: when `payload` is pruned AND the shard has a
  *    [[graft.sinks.WarcShards]] `shard-NNNNN.cdx` sidecar, the
  *    reader seeks each record's gzip-member offset and inflates
  *    ONLY the header block (a few hundred bytes of a member),
  *    abandoning the member before its payload — a manifest query
  *    over 100 TB of shards decompresses headers only. (This is
  *    exactly what CDX indexes exist for at Common Crawl.)
  *
  * Multi-member gzip (one member per record — our sink's layout),
  * single-stream gzip (foreign `.warc.gz`/`.wet.gz` written as one
  * deflate stream) and plain `.warc`/`.wet` all parse: Java's
  * GZIPInputStream is multi-member-transparent and the record walk
  * never assumes member boundaries. Unknown WARC versions refuse
  * loudly; `warcinfo`/`request`/`metadata` records are ROWS (callers
  * filter on `warc_type`), matching how WARC tooling exposes them.
  *
  * Shard-level predicate pushdown mirrors [[TarSource]]: `shard = N`
  * / `shard IN (…)` prune whole shard FILES at planning; `shard`
  * derives from the `shard-NNNNN.warc.gz` name convention, −1 for
  * foreign names (pruned only if the predicate excludes −1).
  *
  * HTTP envelope split (r12): a real Common Crawl `response`
  * record's payload is `HTTP status line + headers + CRLF CRLF +
  * body` glued together (the record's Content-Type is
  * `application/http; msgtype=response`, NOT the page's). Three
  * derived columns make "point the engine at a CC segment, get HTML
  * bodies" a one-liner: `http_status` (int from the status line),
  * `http_content_type` (the envelope's Content-Type header,
  * obs-fold-aware), `body` (bytes after the header block). All three
  * are null for records without an `application/http` envelope
  * (conversion/warcinfo/metadata rows, and foreign payloads that
  * don't start with `HTTP/`). Pruning composes: requesting only
  * header columns still rides the cdx header-only path; requesting
  * `body` (like `payload`) reads payload bytes — the split itself is
  * one separator scan, no copy of the header region. */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcSource.WarcTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {

  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("http_content_encoding", StringType, nullable = true),
    StructField("http_transfer_encoding", StringType, nullable = true),
    StructField("http_location", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  /** Columns whose values require the record's payload bytes. */
  private val PayloadDerived = Set("payload", "http_status", "http_content_type",
    "http_content_encoding", "http_transfer_encoding", "http_location", "body")

  /** `(target_uri, text)` straight from WET shards — the de-facto
    * Common Crawl text-pipeline entry: `conversion` records are the
    * extracted plain text (UTF-8 by the WET convention), one per
    * page. Header-field and payload semantics are the source's; this
    * is a thin filter+decode, kept as an operator so the one-liner
    * stays a one-liner. */
  def wetText(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("graft.sources.WarcSource").option("path", path).load()
      .filter(col("warc_type") === "conversion")
      .select(col("target_uri"), col("payload").cast(StringType).as("text"))
  }

  /** `(target_uri, http_status, http_content_type, html)` from a raw
    * `.warc.gz` crawl — the response-record sibling of [[wetText]]:
    * successful (2xx) text-typed (`text/…` or `application/xhtml+xml`)
    * responses' bodies decoded by, in priority order: the charset the
    * envelope DECLARES (`charset=` parameter, case-insensitive), a
    * `<meta …charset=…>` SNIFF of the first 1 KiB when the envelope
    * declares nothing (covers both `<meta charset="x">` and the
    * `http-equiv` form — the prefix is read as ISO-8859-1, a
    * byte-preserving superset, purely to pattern-match), else UTF-8
    * (the HTML5 default). Decoding itself is
    * [[graft.functions.CharsetDecode]] (r13): the real-web alias
    * whitelist (gbk/gb2312/gb18030, shift_jis, euc-jp/kr, big5,
    * iso-8859-2…15, windows-125x, koi8, tis-620 … — the charsets that
    * carry the non-Western web) with strict `REPORT` semantics — an
    * unknown charset OR malformed bytes yield NULL `html` (loud:
    * count the nulls before trusting a segment), never an exception
    * (one broken page must not kill a 100 TB scan) and never
    * replacement-char mojibake. A LYING declaration (UTF-8 bytes
    * labeled shift_jis can decode "successfully" into katakana salad)
    * is undetectable at this layer by construction — the langid and
    * quality gates downstream are where it dies. Decode runs in the
    * projection, after the envelope split already paid the payload
    * read; non-text/non-2xx/malformed rows are filtered by the null
    * columns the split contract guarantees. */
  def responseText(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    responseTextOf(
      spark.read.format("graft.sources.WarcSource").option("path", path).load())

  /** The [[responseText]] transformation over an ALREADY-LOADED
    * WarcSource frame — batch or STREAMING (r14): every stage is a
    * pure projection/filter, so the same chain rides a
    * `readStream` micro-batch unchanged (the [[graft.streaming.DocStream.curateRawCrawl]]
    * entry). */
  def responseTextOf(warc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val declared = lower(regexp_extract(lower(col("http_content_type")),
      "charset=\"?([a-zA-Z0-9_\\-]+)", 1))
    // ISO-8859-1 maps every byte to a char, so the sniff regex sees
    // the raw prefix bytes faithfully regardless of the true charset.
    // The sniff (and the charset decode) read the fully DECODED
    // bytes (`_raw`): chunked Transfer-Encoding framing stripped
    // (r14), then the Content-Encoding gzip/deflate inflate (r13) —
    // sniffing framed or compressed bytes is noise. Both stages are
    // staged as named columns so each runs once per row, not once per
    // reference.
    val sniffed = lower(regexp_extract(
      lower(decode(substring(col("_raw"), 1, 1024), "ISO-8859-1")),
      "<meta[^>]{0,200}?charset\\s*=\\s*[\"']?([a-z0-9_\\-]+)", 1))
    val cs = when(declared =!= "", declared)
      .when(sniffed =!= "", sniffed)
      .otherwise(lit("utf-8"))
    val ct = lower(col("http_content_type"))
    warc
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        (ct.startsWith("text/") || ct.startsWith("application/xhtml+xml")))
      // r14: chunked Transfer-Encoding framing comes off FIRST (it is
      // applied last on the wire), then the Content-Encoding inflate,
      // then the charset layer — each staged as a named column so it
      // runs once per row
      .withColumn("_deframed", graft.functions.HttpBody.httpTransferDecode(
        col("body"), lower(col("http_transfer_encoding"))))
      .withColumn("_raw", graft.functions.HttpBody.httpBodyDecode(
        col("_deframed"), lower(col("http_content_encoding"))))
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        graft.functions.CharsetDecode.charsetDecode(col("_raw"), cs).as("html"))
  }

  /** Raw crawl → visible text, the one-liner for segments WITHOUT a
    * WET sibling (r13): [[responseText]] (transfer decode → charset
    * decode) → [[graft.functions.Text.stripHtml]] (script/style
    * bodies dropped, tags to spaces, entities decoded, whitespace
    * collapsed). `(target_uri, text)` — the [[wetText]] shape, so
    * everything downstream (Gopher, dedup, `curateWetCrawl`'s batch
    * analog q120/q125) composes unchanged. Undecodable pages (null
    * `html`) are dropped here — count them via [[responseText]]
    * before trusting a segment. */
  def crawlText(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    crawlTextOf(
      spark.read.format("graft.sources.WarcSource").option("path", path).load())

  /** [[crawlText]] over an already-loaded WarcSource frame (batch or
    * streaming — see [[responseTextOf]]).
    *
    * `dropNoindex` (r15, opt-in): honor page-level
    * `<meta name=robots content=noindex>` — a noindex page must not
    * enter a SERVED corpus, which is exactly what this chain feeds.
    * Costs the [[graft.operators.Links.metaRobots]] rlikes as extra
    * references to the decoded-html alias (collapse re-inlines the
    * decode per reference — ~2 extra decodes per page when enabled),
    * which is why it is a flag and not the default: WET-parity
    * pipelines (q125/q126) keep the historical default, corpora
    * built for SERVING turn it on.
    *
    * `mainContent` (r16, opt-in): replace whole-page `stripHtml` with
    * [[graft.operators.Corpus.extractContent]] — the block-level
    * content/chrome classifier (jusText family): navigation, link
    * lists, footers and button bars drop; article text (plus its
    * short headings/lead-ins next to good blocks) survives. Still a
    * pure projection (no shuffle). Opt-in because WET parity is the
    * verifiable default — a WET conversion keeps chrome text, and
    * the q118/q125 gates pin that equivalence. */
  def crawlTextOf(warc: org.apache.spark.sql.DataFrame,
      dropNoindex: Boolean = false,
      mainContent: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val decoded = responseTextOf(warc).filter(col("html").isNotNull)
    val kept =
      if (dropNoindex)
        graft.operators.Links.metaRobots(decoded, "html")
          .filter(!col("noindex")).drop("noindex", "nofollow")
      else decoded
    if (mainContent)
      graft.operators.Corpus.extractContent(kept, "html", outCol = "text")
        .select(col("target_uri"), col("text"))
    else
      kept.select(col("target_uri"),
        graft.functions.Text.stripHtml(col("html")).as("text"))
  }

  /** Split an `application/http` envelope: returns
    * `(status, contentType, body)` or null when the payload does not
    * parse as an HTTP message (callers emit null columns — foreign
    * crawls contain malformed responses, and a scan must not die on
    * one record). Separator search accepts CRLFCRLF and bare LFLF
    * (tolerant readers are the WARC-tooling norm); header lookup is
    * case-insensitive with RFC 7230 obs-fold continuation lines. */
  private[graft] def httpSplit(
      payload: Array[Byte]): (Int, String, String, String, String, Array[Byte]) = {
    if (payload == null || payload.length < 12) return null
    // must start with "HTTP/"
    if (!(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' &&
        payload(3) == 'P' && payload(4) == '/')) return null
    // find the first CRLFCRLF or LFLF
    var i = 0
    var headerEnd = -1   // exclusive end of header bytes
    var bodyStart = -1
    while (bodyStart < 0 && i < payload.length) {
      if (payload(i) == '\n') {
        if (i + 1 < payload.length && payload(i + 1) == '\n') {
          headerEnd = i + 1; bodyStart = i + 2
        } else if (i + 2 < payload.length && payload(i + 1) == '\r' &&
            payload(i + 2) == '\n') {
          headerEnd = i + 1; bodyStart = i + 3
        }
      }
      i += 1
    }
    if (bodyStart < 0) return null
    val head = new String(payload, 0, headerEnd, "ISO-8859-1")
    val lines = head.split("\n").map(l => if (l.endsWith("\r")) l.dropRight(1) else l)
    if (lines.isEmpty) return null
    // status line: HTTP/1.x SP status [SP reason]
    val parts = lines(0).split(" ", 3)
    if (parts.length < 2) return null
    val status = try parts(1).toInt catch { case _: NumberFormatException => return null }
    // unfold obs-fold continuations, then find Content-Type,
    // Content-Encoding (r13: gzip/deflate response bodies are the
    // crawl norm) and Transfer-Encoding (r14: raw mirrors and
    // self-captured WARCs store chunk-framed bodies as-transferred)
    var contentType: String = null
    var contentEncoding: String = null
    var transferEncoding: String = null
    var location: String = null // r15: 3xx redirect target, the link-layer edge
    var j = 1
    var curName: String = null
    var curValue: StringBuilder = null
    def flush(): Unit = if (curName != null) {
      if (curName == "content-type" && contentType == null)
        contentType = curValue.toString.trim
      if (curName == "content-encoding" && contentEncoding == null)
        contentEncoding = curValue.toString.trim
      if (curName == "transfer-encoding" && transferEncoding == null)
        transferEncoding = curValue.toString.trim
      if (curName == "location" && location == null)
        location = curValue.toString.trim
      curName = null; curValue = null
    }
    while (j < lines.length) {
      val l = lines(j)
      if (l.nonEmpty && (l.charAt(0) == ' ' || l.charAt(0) == '\t')) {
        if (curValue != null) curValue.append(' ').append(l.trim)
      } else {
        flush()
        val c = l.indexOf(':')
        if (c > 0) {
          curName = l.substring(0, c).trim.toLowerCase
          curValue = new StringBuilder(l.substring(c + 1).trim)
        }
      }
      j += 1
    }
    flush()
    val body = java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    (status, contentType, contentEncoding, transferEncoding, location, body)
  }

  private[sources] class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
    private val path = props.getOrElse("path",
      throw new IllegalArgumentException("WarcSource requires option 'path'"))
    private val maxFilesPerTrigger =
      props.get("maxFilesPerTrigger").map(_.toInt).getOrElse(16)
    override def name(): String = s"warc($path)"
    override def schema(): StructType = WarcSource.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new WarcScanBuilder(path, maxFilesPerTrigger)
  }

  private[sources] class WarcScanBuilder(path: String, maxFilesPerTrigger: Int = 16)
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters {
    private var required: StructType = WarcSource.schema
    private var shardFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def pushFilters(
        filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
      import org.apache.spark.sql.sources.{EqualTo, In}
      shardFilters = filters.collect {
        case f @ EqualTo("shard", _) => f
        case f @ In("shard", _) => f
      }
      filters // all re-evaluated by Spark; pruning is planning-only
    }
    override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = shardFilters
    override def build(): Scan =
      new WarcScan(path, required, shardFilters, maxFilesPerTrigger)
  }

  private[sources] case class WarcFilePartition(file: String, shard: Int) extends InputPartition

  private[sources] class WarcScan(path: String, required: StructType,
      shardFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
      maxFilesPerTrigger: Int = 16)
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def toMicroBatchStream(
        checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      WarcSource.microBatchStream(path, required, maxFilesPerTrigger)
    private def shardAdmitted(shard: Int): Boolean = {
      import org.apache.spark.sql.sources.{EqualTo, In}
      shardFilters.forall {
        case EqualTo("shard", v: Number) => shard == v.intValue
        case In("shard", vs) => vs.exists {
          case v: Number => shard == v.intValue
          case _ => false
        }
        case _ => true
      }
    }
    override def description(): String = {
      val f = if (shardFilters.isEmpty) ""
        else s" shardFilters=[${shardFilters.mkString(",")}]"
      s"warc shards: $path cols=[${required.fieldNames.mkString(",")}]$f"
    }
    override def planInputPartitions(): Array[InputPartition] = {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) throw new java.io.FileNotFoundException(path)
      val st = fs.getFileStatus(p)
      val warcName = (n: String) => n.endsWith(".warc.gz") || n.endsWith(".warc") ||
        n.endsWith(".wet.gz") || n.endsWith(".wet")
      val files =
        if (st.isDirectory)
          fs.listStatus(p).filter(s => s.isFile && warcName(s.getPath.getName))
            .sortBy(_.getPath.getName)
        else Array(st)
      files.flatMap { f =>
        val n = f.getPath.getName
        val shard =
          if (n.startsWith("shard-") && n.endsWith(".warc.gz"))
            scala.util.Try(n.stripPrefix("shard-").stripSuffix(".warc.gz").toInt).getOrElse(-1)
          else -1
        if (shardAdmitted(shard))
          Some(WarcFilePartition(fs.makeQualified(f.getPath).toString, shard): InputPartition)
        else None
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new WarcReaderFactory(required,
        new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))
  }

  /** Streaming tail-follow of a growing crawl directory — the
    * arriving-segment half of the incremental-dedup story: new
    * `.warc.gz`/`.wet.gz` files become micro-batch partitions
    * through the SAME reader (and cdx header-only fast path) as the
    * batch scan, on the shared [[FileSetMicroBatchStream]] kernel
    * (file-set offsets, maxFilesPerTrigger admission, AvailableNow
    * drain-target freeze, vanished-file refusal). */
  private[sources] def microBatchStream(path: String, required: StructType,
      maxFilesPerTrigger: Int): FileSetMicroBatchStream =
    new FileSetMicroBatchStream(
      path,
      n => n.endsWith(".warc.gz") || n.endsWith(".warc") ||
        n.endsWith(".wet.gz") || n.endsWith(".wet"),
      (qualified, n) => {
        val shard =
          if (n.startsWith("shard-") && n.endsWith(".warc.gz"))
            scala.util.Try(n.stripPrefix("shard-").stripSuffix(".warc.gz").toInt)
              .getOrElse(-1)
          else -1
        WarcFilePartition(qualified, shard)
      },
      () => new WarcReaderFactory(required,
        new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)),
      maxFilesPerTrigger)

  private[sources] class WarcReaderFactory(required: StructType, conf: SerializableHadoopConf)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[WarcFilePartition]
      // http_*/body derive from payload bytes, so any of them forces
      // the payload read; only pure header projections ride the cdx
      // header-only path
      val wantPayload = required.fieldNames.exists(PayloadDerived)
      val path = new Path(p.file)
      val fs = path.getFileSystem(conf.value)
      val cdx = if (p.file.endsWith(".warc.gz"))
        new Path(p.file.stripSuffix(".warc.gz") + ".cdx") else null
      if (!wantPayload && cdx != null && fs.exists(cdx))
        new CdxHeaderReader(path, cdx, p.shard, required, conf)
      else
        new SequentialReader(path, p.shard, required, wantPayload, conf)
    }
  }

  /** Streaming WARC record parser over an (already decompressed)
    * input stream. `readPayload=false` discards payload bytes into a
    * scratch buffer; `headerOnly` additionally stops BEFORE the
    * payload (the cdx fast path abandons the member there). After a
    * true `next()`: [[recordId]]/[[warcType]]/[[targetUri]]/
    * [[contentType]] (null when absent), [[contentLength]],
    * [[payload]] (null unless `readPayload`). */
  private[graft] class RecordParser(in: java.io.InputStream, name: String,
      readPayload: Boolean, headerOnly: Boolean = false) {
    var recordId: String = _
    var warcType: String = _
    var targetUri: String = _
    var contentType: String = _
    var contentLength: Long = _
    var payload: Array[Byte] = _
    private val lineBuf = new java.io.ByteArrayOutputStream(256)
    private lazy val scratch = new Array[Byte](8192) // discard path only

    /** Next line without trailing CRLF; null at EOF before any byte. */
    private def readLine(): String = {
      lineBuf.reset()
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') { lineBuf.write(c); c = in.read() }
      val b = lineBuf.toByteArray
      val len = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
      new String(b, 0, len, "UTF-8")
    }

    private def readFully(buf: Array[Byte], len: Int): Unit = {
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) throw new java.io.EOFException(s"truncated WARC record in $name")
        off += n
      }
    }

    def next(): Boolean = {
      // skip the inter-record blank lines (the two CRLF a record ends
      // with, plus any extra separators foreign writers emit)
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) return false
      if (!line.startsWith("WARC/"))
        throw new java.io.IOException(s"expected WARC version line in $name, got: $line")
      val v = line.stripPrefix("WARC/")
      if (!(v.startsWith("0.") || v.startsWith("1.")))
        throw new java.io.IOException(s"unsupported WARC version in $name: $line")
      recordId = null; warcType = null; targetUri = null; contentType = null
      contentLength = -1L; payload = null
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) {
          val k = h.substring(0, i).trim.toLowerCase
          val value = h.substring(i + 1).trim
          k match {
            case "warc-record-id" =>
              recordId = value.stripPrefix("<").stripSuffix(">")
            case "warc-type" => warcType = value
            case "warc-target-uri" => targetUri = value
            case "content-type" => contentType = value
            case "content-length" => contentLength = value.toLong
            case _ => () // WARC-Date, block digests, …: not surfaced
          }
        }
        h = readLine()
      }
      if (h == null) throw new java.io.EOFException(s"truncated WARC header in $name")
      if (contentLength < 0)
        throw new java.io.IOException(s"WARC record without Content-Length in $name")
      if (!headerOnly) {
        if (readPayload) {
          require(contentLength <= Int.MaxValue,
            s"WARC record payload is $contentLength bytes (> 2 GB) in $name")
          payload = new Array[Byte](contentLength.toInt)
          readFully(payload, payload.length)
        } else {
          var left = contentLength
          while (left > 0) {
            val n = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
            if (n < 0) throw new java.io.EOFException(s"truncated WARC payload in $name")
            left -= n
          }
        }
      }
      true
    }
  }

  private def rowFor(required: StructType, shard: Int, p: RecordParser): InternalRow = {
    // the envelope split runs at most once per record, and only when
    // an http_*/body column is actually required AND the record
    // declares an application/http envelope
    lazy val http: (Int, String, String, String, String, Array[Byte]) =
      if (p.warcType != null && p.warcType.equalsIgnoreCase("response") &&
          p.contentType != null &&
          p.contentType.toLowerCase.startsWith("application/http"))
        httpSplit(p.payload)
      else null
    val values = required.fieldNames.map {
      case "shard" => shard: java.lang.Integer
      case "record_id" => if (p.recordId == null) null else UTF8String.fromString(p.recordId)
      case "warc_type" => if (p.warcType == null) null else UTF8String.fromString(p.warcType)
      case "target_uri" => if (p.targetUri == null) null else UTF8String.fromString(p.targetUri)
      case "content_type" => if (p.contentType == null) null else UTF8String.fromString(p.contentType)
      case "content_length" => p.contentLength: java.lang.Long
      case "payload" => p.payload
      case "http_status" => if (http == null) null else (http._1: java.lang.Integer)
      case "http_content_type" =>
        if (http == null || http._2 == null) null else UTF8String.fromString(http._2)
      case "http_content_encoding" =>
        if (http == null || http._3 == null) null else UTF8String.fromString(http._3)
      case "http_transfer_encoding" =>
        if (http == null || http._4 == null) null else UTF8String.fromString(http._4)
      case "http_location" =>
        if (http == null || http._5 == null) null else UTF8String.fromString(http._5)
      case "body" => if (http == null) null else http._6
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  /** Sequential task reader: gunzip (multi-member-transparent) when
    * the name says so, then a single record walk. */
  private[sources] class SequentialReader(path: Path, shard: Int, required: StructType,
      wantPayload: Boolean, conf: SerializableHadoopConf)
      extends PartitionReader[InternalRow] {
    private val in = {
      val raw = new java.io.BufferedInputStream(path.getFileSystem(conf.value).open(path))
      if (path.getName.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw, 8192) else raw
    }
    private val parser = new RecordParser(in, path.getName, readPayload = wantPayload)
    private var row: InternalRow = null
    override def next(): Boolean = {
      if (parser.next()) { row = rowFor(required, shard, parser); true }
      else { row = null; false }
    }
    override def get(): InternalRow = row
    override def close(): Unit = in.close()
  }

  /** Caps reads at the member's compressed length so a per-member
    * GZIPInputStream can never buffer into the next member. */
  private class BoundedIn(under: java.io.InputStream, var left: Long)
      extends java.io.InputStream {
    override def read(): Int =
      if (left <= 0) -1
      else { val c = under.read(); if (c >= 0) left -= 1; c }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (left <= 0) return -1
      val n = under.read(b, off, math.min(len.toLong, left).toInt)
      if (n > 0) left -= n
      n
    }
  }

  /** cdx fast path: payload is pruned and the sink's sidecar exists,
    * so seek each gzip member's offset and inflate only its header
    * block — payload bytes are never decompressed. The header's
    * Content-Length is cross-checked against the cdx line (a stale
    * or foreign sidecar fails loudly instead of mis-serving). */
  private[sources] class CdxHeaderReader(path: Path, cdxPath: Path, shard: Int,
      required: StructType, conf: SerializableHadoopConf)
      extends PartitionReader[InternalRow] {
    private val fs = path.getFileSystem(conf.value)
    private val raw = fs.open(path)
    private val entries: Iterator[(Long, Long, Long)] = {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(cdxPath), "UTF-8"))
      val es = try {
        Iterator.continually(r.readLine()).takeWhile(_ != null).map { l =>
          val f = l.split("\t", -1)
          require(f.length == 4, s"malformed cdx line in $cdxPath: $l")
          (f(1).toLong, f(2).toLong, f(3).toLong)
        }.toVector
      } finally r.close()
      // a SHORT sidecar (stale/truncated) passes every per-record
      // Content-Length cross-check yet silently under-serves rows —
      // the entry COUNT must be validated too: the last member must
      // end exactly at the shard's end (members tile the file)
      val fileLen = fs.getFileStatus(path).getLen
      val covered = es.lastOption.map { case (off, len, _) => off + len }.getOrElse(0L)
      require(covered == fileLen,
        s"cdx sidecar $cdxPath covers $covered of $fileLen bytes in $path — " +
          "truncated or stale sidecar?")
      es.iterator
    }
    private var row: InternalRow = null
    override def next(): Boolean = {
      if (!entries.hasNext) { row = null; return false }
      val (offset, clen, payloadBytes) = entries.next()
      raw.seek(offset)
      val gz = new java.util.zip.GZIPInputStream(new BoundedIn(raw, clen), 512)
      try {
        val p = new RecordParser(gz, path.getName, readPayload = false, headerOnly = true)
        if (!p.next())
          throw new java.io.EOFException(s"cdx offset $offset past end of $path")
        require(p.contentLength == payloadBytes,
          s"cdx payload_bytes $payloadBytes != Content-Length ${p.contentLength} " +
            s"at offset $offset of $path — stale sidecar?")
        row = rowFor(required, shard, p)
      } finally gz.close()
      true
    }
    override def get(): InternalRow = row
    override def close(): Unit = raw.close()
  }
}
