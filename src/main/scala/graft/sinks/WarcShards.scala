package graft.sinks

import graft.SerializableHadoopConf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC-shard export — the OTHER container format of the large-scale
  * text world: Common Crawl's interchange format (ISO 28500). Where
  * [[TarShards]] ships a curated corpus to a trainer as WebDataset
  * tars, this sink ships it as `shard-NNNNN.warc.gz` files of
  * WARC/1.0 `conversion` records (the WET layout — extracted plain
  * text, one record per document), which is what crawl-derived
  * corpora are exchanged as upstream of curation.
  *
  * Layout matches Common Crawl's on-disk convention: EACH RECORD IS
  * ITS OWN GZIP MEMBER, members concatenated. A whole shard still
  * gunzips as one stream (multi-member gzip is defined to
  * concatenate), but a reader holding a byte offset can decompress
  * ONE record without touching the rest — that is what makes a
  * 100 TB WARC corpus randomly addressable. The offsets live in a
  * `shard-NNNNN.cdx` sidecar (one `key \t offset \t length \t
  * payload_bytes` line per record, the role CDX indexes play for
  * Common Crawl): [[graft.sources.WarcSource]] uses it to serve
  * header-only scans by seeking member starts and abandoning each
  * member after its header block — payload bytes are never inflated.
  *
  * Record bytes are deterministic: fixed field order, `WARC-Date:
  * 1970-01-01T00:00:00Z`, and `WARC-Record-ID` derived from the md5
  * of the key formatted as a urn:uuid (md5 so the q108 twin
  * re-derives every id in SQL — the q23-class lesson that
  * engine-private hashes cannot gate). Members are written in
  * ascending key order within a shard. The COMPRESSED bytes are
  * deterministic per JVM (same zlib) but, like q72's
  * DeflateRatio, not portable across zlib builds — so the gate
  * queries hash record counts, payload byte sums and read-back
  * content, never compressed sizes.
  *
  * Sharding, staging and I/O discipline are [[TarShards]]'s: md5-
  * prefix `mod nShards` assignment (oracle-portable, embarrassingly
  * parallel), one `repartition` shuffle, streamed record-by-record
  * writes through the Hadoop `FileSystem` API (hdfs/s3a/file URIs
  * all work; nothing shard-sized in memory), temp-file + atomic
  * rename, stale-shard cleanup before writing.
  */
object WarcShards {

  /** Deterministic shard id — [[TarShards.shardOf]]'s md5-prefix rule. */
  def shardOf(key: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    TarShards.shardOf(key, nShards)

  /** `WARC-Record-ID` value for a key: md5(key) hex grouped as a
    * urn:uuid. Mirrored in SQL by the q108 twin. */
  def recordIdOf(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes("UTF-8"))
    val h = d.map(b => f"${b & 0xff}%02x").mkString
    s"urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"
  }

  /** Header-injection guard: every value interpolated into WARC
    * headers must be CR/LF-free (a foreign caller passing a URI with
    * control characters would otherwise forge headers or corrupt the
    * record framing), and the key additionally tab-free (tab is the
    * cdx sidecar's field separator — a tab in the key writes a cdx
    * line that only fails later, at read time). Fails loudly per the
    * sink's null/duplicate-key discipline. */
  private def requireHeaderSafe(what: String, v: String, key: String): Unit =
    if (v != null && (v.indexOf('\r') >= 0 || v.indexOf('\n') >= 0))
      throw new IllegalArgumentException(
        s"$what contains CR/LF (record key '$key') — WARC header injection refused")

  private[sinks] def recordBytes(
      key: String, targetUri: String, warcType: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    requireHeaderSafe("key", key, key)
    if (key != null && key.indexOf('\t') >= 0)
      throw new IllegalArgumentException(
        s"key '$key' contains a tab — the cdx sidecar's field separator")
    requireHeaderSafe("target URI", targetUri, key)
    requireHeaderSafe("WARC type", warcType, key)
    requireHeaderSafe("content type", contentType, key)
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: <").append(recordIdOf(key)).append(">\r\n")
    sb.append("WARC-Date: 1970-01-01T00:00:00Z\r\n")
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private class CountingOutputStream(under: java.io.OutputStream)
      extends java.io.FilterOutputStream(under) {
    var count: Long = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
  }

  /** Shield for the shard stream: one gzip member per record means
    * one GZIPOutputStream per record, whose close() must end its
    * Deflater (native memory) but NOT close the shard underneath. */
  private class NonClosing(under: java.io.OutputStream)
      extends java.io.FilterOutputStream(under) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      under.write(b, off, len)
    override def close(): Unit = under.flush()
  }

  /** Write `df`'s rows as WARC conversion shards:
    * `<outDir>/shard-NNNNN.warc.gz` + `shard-NNNNN.cdx`. `keyCol`
    * must be unique and payloads non-null; `uriCol` (nullable
    * string) becomes `WARC-Target-URI`. Returns the manifest
    * `(shard, n_records, payload_bytes, warc_bytes)` parsed back
    * from the written files by [[manifest]]'s independent reader.
    * Stale `shard-*.warc.gz` / `shard-*.cdx` / temp files in
    * `outDir` are deleted first (the TarShards re-run contract). */
  def write(df: DataFrame, keyCol: String, uriCol: String, payloadCol: String,
      outDir: String, nShards: Int,
      warcType: String = "conversion",
      contentType: String = "text/plain"): DataFrame = {
    require(nShards >= 1)
    val spark = df.sparkSession
    val outPath = new Path(outDir)
    val driverFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(outPath)
    driverFs.listStatus(outPath).foreach { st =>
      val n = st.getPath.getName
      val stale = (n.startsWith("shard-") &&
          (n.endsWith(".warc.gz") || n.endsWith(".cdx"))) ||
        (n.startsWith(".shard-") && n.endsWith(".tmp"))
      if (stale) driverFs.delete(st.getPath, false)
    }
    val qualified = driverFs.makeQualified(outPath).toString
    val serConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rows = df.select(
        col(keyCol).cast(StringType).as("key"),
        col(uriCol).cast(StringType).as("uri"),
        col(payloadCol).cast(BinaryType).as("payload"))
      .withColumn("shard", shardOf(col("key"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("key"))
    rows.select(col("shard"), col("key"), col("uri"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.STRING, Encoders.BINARY))
      .foreachPartition { it: Iterator[(Int, String, String, Array[Byte])] =>
        val dir = new Path(qualified)
        val fs = dir.getFileSystem(serConf.value)
        var cur = -1
        var out: CountingOutputStream = null
        var cdx: java.io.Writer = null
        var tmpWarc: Path = null
        var tmpCdx: Path = null
        var lastKey: String = null
        def close(): Unit = if (out != null) {
          out.close(); cdx.close()
          val finWarc = new Path(dir, f"shard-$cur%05d.warc.gz")
          val finCdx = new Path(dir, f"shard-$cur%05d.cdx")
          for ((tmp, fin) <- Seq((tmpWarc, finWarc), (tmpCdx, finCdx))) {
            if (fs.exists(fin)) fs.delete(fin, false)
            if (!fs.rename(tmp, fin)) throw new java.io.IOException(s"rename to $fin failed")
          }
          out = null; cdx = null
        }
        it.foreach { case (shard, key, uri, payload) =>
          if (shard != cur) {
            close()
            cur = shard
            lastKey = null
            tmpWarc = new Path(dir, f".shard-$cur%05d.warc.gz.tmp")
            tmpCdx = new Path(dir, f".shard-$cur%05d.cdx.tmp")
            out = new CountingOutputStream(
              new java.io.BufferedOutputStream(fs.create(tmpWarc, true)))
            cdx = new java.io.OutputStreamWriter(
              new java.io.BufferedOutputStream(fs.create(tmpCdx, true)), "UTF-8")
          }
          require(key != lastKey, s"duplicate key '$key' in shard $shard")
          require(payload != null, s"null payload for key '$key'")
          lastKey = key
          val start = out.count
          val gz = new java.util.zip.GZIPOutputStream(new NonClosing(out), 8192)
          gz.write(recordBytes(key, uri, warcType, contentType, payload))
          gz.close() // finishes the member, ends the Deflater, keeps the shard open
          cdx.write(s"$key\t$start\t${out.count - start}\t${payload.length}\n")
        }
        close()
      }
    manifest(spark, outDir)
  }

  /** Manifest by PARSING the written shards with an independent
    * reader: one multi-member gunzip stream per shard walked record
    * by record (header lines + Content-Length + payload consume —
    * nothing shard-sized in memory), never the cdx (the spec checks
    * cdx agreement separately): `(shard, n_records, payload_bytes,
    * warc_bytes)`. `warc_bytes` is the compressed file length —
    * zlib-build-specific, excluded from oracle gates. */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(st => st.getPath.getName.startsWith("shard-") &&
        st.getPath.getName.endsWith(".warc.gz"))
      .sortBy(_.getPath.getName)
    val rows = files.map { st =>
      val name = st.getPath.getName
      val shard = name.stripPrefix("shard-").stripSuffix(".warc.gz").toInt
      val in = new java.util.zip.GZIPInputStream(
        new java.io.BufferedInputStream(fs.open(st.getPath)), 8192)
      var n = 0L
      var payload = 0L
      try {
        val rec = new graft.sources.WarcSource.RecordParser(in, name, readPayload = false)
        while (rec.next()) { n += 1; payload += rec.contentLength }
      } finally in.close()
      org.apache.spark.sql.Row(shard, n, payload, st.getLen)
    }
    spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
      StructField("shard", IntegerType, nullable = false),
      StructField("n_records", LongType, nullable = false),
      StructField("payload_bytes", LongType, nullable = false),
      StructField("warc_bytes", LongType, nullable = false))))
  }
}
