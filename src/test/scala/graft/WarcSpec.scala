package graft

import graft.sinks.WarcShards
import org.apache.spark.sql.functions._
import scala.sys.process._

/** WARC shard export + DSv2 read-back: round-trip equality, the
  * foreign validator (the gzip CLI — an independent zlib consumer —
  * must decompress every member and see the right record count),
  * byte-determinism, cdx sidecar agreement, the cdx header-only fast
  * path PROVABLY not touching payload bytes, foreign single-stream
  * WARC/WET layouts, and the contract errors. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("warcshards").toString

  private val docs = Seq(
    ("alpha", "urn:x:alpha", "the quick brown fox"),
    ("beta", "urn:x:beta", "x" * 513),
    ("gamma", "urn:x:gamma", ""), // empty payload record
    ("delta", "urn:x:delta", "exactly".padTo(512, '!')),
    ("epsilon", "urn:x:epsilon", "short")
  ).toDF("k", "u", "t").select(col("k"), col("u"), col("t").cast("binary").as("p"))

  private def readBack(dir: String) =
    spark.read.format("graft.sources.WarcSource").option("path", dir).load()

  test("round-trip: records come back with every header field and exact payloads") {
    val dir = freshDir()
    val manifest = WarcShards.write(docs, "k", "u", "p", dir, nShards = 2)
    assert(manifest.agg(sum("n_records")).collect()(0).getLong(0) === 5L)
    val rows = readBack(dir)
      .select("target_uri", "record_id", "warc_type", "content_type",
        "content_length", "payload")
      .collect()
    assert(rows.length === 5)
    val byUri = rows.map(r => r.getString(0) -> r).toMap
    val expected = docs.collect().map(r =>
      (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2))).toSeq
    for ((k, u, p) <- expected) {
      val r = byUri(u)
      assert(r.getString(1) === WarcShards.recordIdOf(k))
      assert(r.getString(2) === "conversion")
      assert(r.getString(3) === "text/plain")
      assert(r.getLong(4) === p.length.toLong)
      assert(r.getAs[Array[Byte]](5) === p)
    }
  }

  test("gzip CLI (foreign zlib) decompresses every member; record count matches") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 2)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
    assert(files.nonEmpty)
    var versions = 0
    for (f <- files) {
      // gzip -t validates EVERY member's CRC; a framing bug dies here
      assert(Seq("gzip", "-t", f.getAbsolutePath).! === 0, s"gzip -t rejected $f")
      val out = java.io.File.createTempFile("warcdec", ".warc")
      assert((Seq("gzip", "-dc", f.getAbsolutePath) #> out).! === 0)
      val bytes = java.nio.file.Files.readAllBytes(out.toPath)
      val pat = "WARC/1.0\r\n".getBytes("US-ASCII")
      versions += (0 to bytes.length - pat.length).count(i =>
        java.util.Arrays.equals(bytes, i, i + pat.length, pat, 0, pat.length))
      out.delete()
    }
    assert(versions === 5)
  }

  test("rewrites are byte-deterministic (warc and cdx both)") {
    val dir1 = freshDir(); val dir2 = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir1, nShards = 2)
    WarcShards.write(docs, "k", "u", "p", dir2, nShards = 2)
    for (n <- new java.io.File(dir1).list().sorted) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir1, n))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir2, n))
      assert(java.util.Arrays.equals(a, b), s"nondeterministic bytes in $n")
    }
  }

  test("a re-run over a smaller corpus leaves no stale shards or sidecars") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 4)
    WarcShards.write(docs.limit(1), "k", "u", "p", dir, nShards = 1)
    // ignore Hadoop LocalFileSystem's .crc shadows (deleted with their files)
    val names = new java.io.File(dir).list().filterNot(_.startsWith(".")).sorted.toSeq
    assert(names === Seq("shard-00000.cdx", "shard-00000.warc.gz"))
    assert(readBack(dir).count() === 1L)
  }

  test("cdx sidecar: one line per record, offsets land on gzip magic, lengths tile the file") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 1)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-00000.warc.gz"))
    val lines = scala.io.Source.fromFile(new java.io.File(dir, "shard-00000.cdx"))
      .getLines().toSeq
    assert(lines.length === 5)
    var expectedOff = 0L
    val expected = docs.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](2)).toMap
    for (l <- lines) {
      val Array(key, off, len, pb) = l.split("\t")
      assert(off.toLong === expectedOff, "members must tile the shard contiguously")
      assert((bytes(off.toInt) & 0xff) === 0x1f && (bytes(off.toInt + 1) & 0xff) === 0x8b,
        s"cdx offset $off is not a gzip member start")
      assert(pb.toLong === expected(key).length.toLong)
      expectedOff += len.toLong
    }
    assert(expectedOff === bytes.length.toLong)
  }

  test("cdx fast path inflates headers only: corrupt payload bytes are never touched") {
    val dir = freshDir()
    // incompressible payloads so each member's compressed body is
    // far larger than the header prefix the fast path inflates
    val rnd = new scala.util.Random(7)
    val big = (0 until 4).map { i =>
      val b = new Array[Byte](8192); rnd.nextBytes(b)
      (s"doc$i", s"urn:x:doc$i", b)
    }
    WarcShards.write(big.toDF("k", "u", "p"), "k", "u", "p", dir, nShards = 1)
    // corrupt one byte near the END of the second member's compressed
    // stream (inside its payload region, before the 8-byte trailer)
    val f = java.nio.file.Paths.get(dir, "shard-00000.warc.gz")
    val bytes = java.nio.file.Files.readAllBytes(f)
    val lines = scala.io.Source.fromFile(new java.io.File(dir, "shard-00000.cdx"))
      .getLines().toVector
    val Array(_, off, len, _) = lines(1).split("\t")
    val target = off.toInt + len.toInt - 50
    bytes(target) = (bytes(target) ^ 0x5a).toByte
    java.nio.file.Files.write(f, bytes)
    // drop the Hadoop LocalFileSystem crc shadow: the test corrupts the
    // DEFLATE stream on purpose, and gzip's own CRC is the detector
    // under test, not the filesystem's
    new java.io.File(dir, ".shard-00000.warc.gz.crc").delete()
    // header-only scan (payload pruned → cdx path): succeeds, full rows
    val pruned = readBack(dir).select("record_id", "content_length").collect()
    assert(pruned.length === 4)
    assert(pruned.forall(_.getLong(1) === 8192L))
    // full-payload scan must hit the corruption (CRC/inflate failure)
    val ex = intercept[Exception] {
      readBack(dir).select("payload").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[java.io.IOException]),
      s"expected an IO/zip failure, got $ex")
  }

  test("foreign layouts: single-stream .warc.gz and plain .wet parse, extra headers tolerated") {
    val dir = freshDir()
    def record(tpe: String, id: String, body: String): String =
      "WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        "WARC-Date: 2020-05-06T07:08:09Z\r\n" +
        (if (tpe == "conversion") "WARC-Target-URI: http://example.com/a\r\n" else "") +
        "WARC-Block-Digest: sha1:DEADBEEF\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n" +
        "\r\n" + body + "\r\n\r\n"
    val payload = record("warcinfo", "00000000-0000-0000-0000-000000000001", "software: test") +
      record("conversion", "00000000-0000-0000-0000-000000000002", "hello warc world")
    // single-stream gzip (NOT member-per-record) — foreign writers do this
    val gz = new java.io.FileOutputStream(new java.io.File(dir, "crawl.warc.gz"))
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(payload.getBytes("UTF-8")); g.close()
    // plain uncompressed WET
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "crawl2.wet"),
      payload.getBytes("UTF-8"))
    val rows = readBack(dir)
      .select("shard", "record_id", "warc_type", "target_uri", "content_length")
      .collect()
    assert(rows.length === 4) // 2 records × 2 files
    assert(rows.forall(_.getInt(0) === -1)) // foreign names: no shard id
    val conv = rows.filter(_.getString(2) == "conversion")
    assert(conv.length === 2)
    assert(conv.forall(_.getString(3) === "http://example.com/a"))
    assert(conv.forall(_.getLong(4) === "hello warc world".length.toLong))
    assert(rows.filter(_.getString(2) == "warcinfo").forall(_.isNullAt(3)))
  }

  test("shard pruning and column pruning advertise in the plan and serve correct rows") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 4)
    val df = readBack(dir).filter(col("shard") === 1).select("shard", "target_uri")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("shardFilters="), s"shard filter not pushed:\n$plan")
    assert(plan.contains("cols=[shard,target_uri]"), s"columns not pruned:\n$plan")
    val all = readBack(dir).select("shard", "target_uri").collect()
    val got = df.collect()
    assert(got.map(_.getString(1)).sorted === all.filter(_.getInt(0) == 1).map(_.getString(1)).sorted)
  }

  test("write→read through an explicit file: URI (Hadoop FileSystem API end-to-end)") {
    // the tier must resolve paths through the Hadoop FS layer: a
    // scheme-qualified URI (the shape hdfs:// / s3a:// present to
    // the code) round-trips write → manifest → DSv2 read unchanged
    val dir = "file://" + freshDir()
    val manifest = WarcShards.write(docs, "k", "u", "p", dir, nShards = 2)
    assert(manifest.agg(sum("n_records")).collect()(0).getLong(0) === 5L)
    val back = spark.read.format("graft.sources.WarcSource")
      .option("path", dir).load()
      .collect().map(r => r.getAs[String]("target_uri") -> r.getAs[Array[Byte]]("payload")).toMap
    val expected = docs.collect().map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(back.keySet === expected.keySet)
    for ((k, v) <- expected) assert(back(k) === v)
  }

  test("streaming curation exports per-batch WARC shards; restart replays nothing") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("warcstream_in").toString
    val out = Files.createTempDirectory("warcstream_out").toString
    val ckpt = Files.createTempDirectory("warcstream_ckpt").toString
    val good1 = "the cat sat on the mat and the dog ran in the park with a ball"
    val good2 = "a stream of documents arrives and the engine keeps the good ones for training"
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s","n_chars":${text.length}}"""
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq(doc(1, good1), doc(2, "!!!!!!!!")).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
      Seq(doc(3, good1), doc(4, good2)).mkString("\n"))
    val q = graft.streaming.DocStream.curateToWarcShards(
      spark, in, out, ckpt, nShards = 2, maxFilesPerTrigger = 1)
    q.awaitTermination()
    def idsIn(dir: String): Set[String] =
      if (!new java.io.File(dir).exists()) Set.empty
      else spark.read.format("graft.sources.WarcSource").option("path", dir).load()
        .select("target_uri").collect()
        .map(_.getString(0).stripPrefix("urn:graft:doc/")).toSet
    val all = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(all.length === 2, all.mkString(","))
    // survivors only: 2 is junk, 3 duplicates good1
    assert(all.flatMap(b => idsIn(s"$out/$b")).toSet === Set("1", "4"))
    // restart on the same checkpoint, no new input: nothing replays
    val q2 = graft.streaming.DocStream.curateToWarcShards(
      spark, in, out, ckpt, nShards = 2, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    val after = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(after === all.toSeq)
  }

  test("http envelope split: CC-shaped response records yield status/content-type/body") {
    val dir = freshDir()
    val html = "<html><body>hello &amp; goodbye</body></html>"
    val envelope = "HTTP/1.1 200 OK\r\n" +
      "Date: Wed, 06 May 2020 07:08:09 GMT\r\n" +
      "Content-Type: text/html;\r\n charset=UTF-8\r\n" + // obs-fold continuation
      s"Content-Length: ${html.length}\r\n" +
      "\r\n" + html
    def record(tpe: String, ctype: String, body: Array[Byte], uri: String): String =
      "WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000a>\r\n" +
        (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
        s"Content-Type: $ctype\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n" + new String(body, "ISO-8859-1") + "\r\n\r\n"
    val payload =
      record("response", "application/http; msgtype=response",
        envelope.getBytes("ISO-8859-1"), "http://example.com/page") +
      record("response", "application/http; msgtype=response",
        "totally not http".getBytes("ISO-8859-1"), "http://example.com/broken") +
      record("conversion", "text/plain",
        "plain text".getBytes("UTF-8"), "http://example.com/wet")
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "cc.warc.gz")))
    gz.write(payload.getBytes("ISO-8859-1")); gz.close()
    val rows = readBack(dir)
      .select("target_uri", "warc_type", "http_status", "http_content_type", "body")
      .collect()
    assert(rows.length === 3)
    val byUri = rows.map(r => r.getString(0) -> r).toMap
    val page = byUri("http://example.com/page")
    assert(page.getInt(2) === 200)
    assert(page.getString(3) === "text/html; charset=UTF-8") // folded line unfolded
    assert(new String(page.getAs[Array[Byte]](4), "UTF-8") === html)
    // malformed envelope: null columns, scan survives
    val broken = byUri("http://example.com/broken")
    assert(broken.isNullAt(2) && broken.isNullAt(3) && broken.isNullAt(4))
    // conversion record: no envelope by definition
    val wet = byUri("http://example.com/wet")
    assert(wet.isNullAt(2) && wet.isNullAt(3) && wet.isNullAt(4))
  }

  test("http split is pruning-aware: header-only projections still ride the cdx path") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 1)
    // corrupting payload bytes (the cdx fast-path probe device): a
    // projection of http-derived columns MUST read payloads, a pure
    // header projection must not
    val f = java.nio.file.Paths.get(dir, "shard-00000.warc.gz")
    val bytes = java.nio.file.Files.readAllBytes(f)
    val lines = scala.io.Source.fromFile(new java.io.File(dir, "shard-00000.cdx"))
      .getLines().toVector
    val Array(_, off, len, _) = lines(1).split("\t")
    val target = off.toInt + len.toInt - 12
    bytes(target) = (bytes(target) ^ 0x5a).toByte
    java.nio.file.Files.write(f, bytes)
    new java.io.File(dir, ".shard-00000.warc.gz.crc").delete()
    // header-only: fine (cdx path, payloads untouched)
    assert(readBack(dir).select("record_id", "content_length").collect().length === 5)
    // body requires payload bytes → must hit the corruption
    val ex = intercept[Exception] { readBack(dir).select("body").collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[java.io.IOException]))
  }

  test("responseText: 2xx text bodies decode by declared charset; others are filtered or null") {
    val dir = freshDir()
    def envelope(status: String, ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def record(uri: String, payload: Array[Byte]): String =
      "WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000b>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n" +
        new String(payload, "ISO-8859-1") + "\r\n\r\n"
    val latin = "café".getBytes("ISO-8859-1")
    val utf = "café".getBytes("UTF-8")
    val payload =
      record("http://x/utf", envelope("200 OK", "text/html; charset=UTF-8", utf)) +
      record("http://x/latin", envelope("200 OK", "text/html; charset=ISO-8859-1", latin)) +
      record("http://x/bare", envelope("200 OK", "text/plain", utf)) + // no charset → UTF-8
      record("http://x/unknown", envelope("200 OK", "text/html; charset=klingon", utf)) +
      record("http://x/404", envelope("404 Not Found", "text/html", utf)) +
      record("http://x/img", envelope("200 OK", "image/png", Array[Byte](1, 2, 3)))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "cc2.warc.gz")))
    gz.write(payload.getBytes("ISO-8859-1")); gz.close()
    val rows = graft.sources.WarcSource.responseText(spark, dir)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    // 404 and image/png filtered entirely
    assert(rows.keySet === Set("http://x/utf", "http://x/latin", "http://x/bare", "http://x/unknown"))
    assert(rows("http://x/utf") === Some("café"))
    assert(rows("http://x/latin") === Some("café")) // latin-1 bytes decoded as declared
    assert(rows("http://x/bare") === Some("café")) // HTML5 default
    assert(rows("http://x/unknown") === None) // unlisted charset → loud null, never mojibake
  }

  test("responseText r13: the non-Western web decodes byte-exactly; malformed bytes NULL loudly") {
    val dir = freshDir()
    def envelope(ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def record(uri: String, payload: Array[Byte]): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000c>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    // foreign-encoded fixtures: each original string round-trips
    // byte-exactly through encode-at-write → declared-charset decode
    val cases: Seq[(String, String, String, String)] = Seq(
      ("gbk", "text/html; charset=GBK", "GBK", "中文网页内容测试"),
      ("gb2312", "text/html; charset=gb2312", "GBK", "简体中文"),
      ("sjis", "text/html; charset=Shift_JIS", "Shift_JIS", "日本語のページです"),
      ("eucjp", "text/plain; charset=EUC-JP", "EUC-JP", "コンテンツ"),
      ("euckr", "text/html; charset=euc-kr", "EUC-KR", "한국어 웹 페이지"),
      ("big5", "text/html; charset=Big5", "Big5", "繁體中文網頁"),
      ("l2", "text/html; charset=ISO-8859-2", "ISO-8859-2", "Zażółć gęślą jaźń"),
      ("koi8", "text/plain; charset=koi8-r", "KOI8-R", "русский текст"),
      ("w1250", "text/html; charset=windows-1250", "windows-1250", "Příliš žluťoučký"),
      ("w1251", "text/html; charset=cp1251", "windows-1251", "кириллица"),
      ("xhtml", "application/xhtml+xml; charset=UTF-8", "UTF-8", "xhtml is text too"))
    val sniffBody = ("<html><head><meta charset=\"windows-1250\"></head>" +
      "Příliš žluťoučký kůň").getBytes("windows-1250")
    val httpEquivBody = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=koi8-r\"></head>привет").getBytes("KOI8-R")
    val malformed = Array[Byte](0x81.toByte, 0x20) // invalid Shift_JIS pair
    val payload: Array[Byte] =
      cases.flatMap { case (k, ct, jvm, s) =>
        record(s"http://x/$k", envelope(ct, s.getBytes(jvm)))
      }.toArray ++
      record("http://x/sniff", envelope("text/html", sniffBody)) ++
      record("http://x/equiv", envelope("text/html", httpEquivBody)) ++
      record("http://x/malformed", envelope("text/html; charset=shift_jis", malformed))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "cc3.warc.gz")))
    gz.write(payload); gz.close()
    val rows = graft.sources.WarcSource.responseText(spark, dir)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    cases.foreach { case (k, _, _, s) =>
      assert(rows(s"http://x/$k") === Some(s), s"charset case $k")
    }
    // no declared charset → <meta> sniff, both spellings
    assert(rows("http://x/sniff").exists(_.endsWith("Příliš žluťoučký kůň")))
    assert(rows("http://x/equiv").exists(_.endsWith("привет")))
    // declared-charset bytes that do not decode → NULL, scan survives
    assert(rows("http://x/malformed") === None)
  }

  test("wetText: (target_uri, text) straight from WET shards") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 2)
    val got = graft.sources.WarcSource.wetText(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = docs.collect()
      .map(r => r.getString(1) -> new String(r.getAs[Array[Byte]](2), "UTF-8")).toMap
    assert(got === expected)
  }

  test("a short cdx sidecar fails loudly instead of under-serving rows") {
    val dir = freshDir()
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 1)
    val cdx = java.nio.file.Paths.get(dir, "shard-00000.cdx")
    val lines = java.nio.file.Files.readAllLines(cdx)
    // drop the LAST line: every remaining entry still passes the
    // per-record Content-Length cross-check — only the coverage
    // check can catch this
    java.nio.file.Files.write(cdx,
      String.join("\n", lines.subList(0, lines.size - 1).asInstanceOf[java.util.List[CharSequence]])
        .concat("\n").getBytes("UTF-8"))
    new java.io.File(dir, ".shard-00000.cdx.crc").delete()
    val ex = intercept[Exception] {
      readBack(dir).select("record_id", "content_length").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("truncated or stale sidecar")), s"got $ex")
  }

  test("header-unsafe values refuse loudly: CR/LF in uri, tab in key") {
    val crlf = Seq(("a", "urn:x:a\r\nWARC-Type: forged", "x")).toDF("k", "u", "t")
      .select(col("k"), col("u"), col("t").cast("binary").as("p"))
    val e1 = intercept[Exception] { WarcShards.write(crlf, "k", "u", "p", freshDir(), nShards = 1) }
    assert(causesOf(e1).exists(c => c.getMessage != null &&
      c.getMessage.contains("header injection")), s"got $e1")
    val tabbed = Seq(("a\tb", "urn:x:a", "x")).toDF("k", "u", "t")
      .select(col("k"), col("u"), col("t").cast("binary").as("p"))
    val e2 = intercept[Exception] { WarcShards.write(tabbed, "k", "u", "p", freshDir(), nShards = 1) }
    assert(causesOf(e2).exists(c => c.getMessage != null &&
      c.getMessage.contains("tab")), s"got $e2")
  }

  private def causesOf(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causesOf(t.getCause)

  private def drainStream(dir: String, ckpt: String,
      batches: scala.collection.mutable.ListBuffer[Seq[String]],
      maxFilesPerTrigger: Int = 16): Unit = {
    val q = spark.readStream.format("graft.sources.WarcSource")
      .option("path", dir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load()
      .select(col("target_uri"), col("content_length")) // header-only projection
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val uris = b.select("target_uri").collect().map(_.getString(0)).toSeq
        batches.synchronized { batches += uris }
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("readStream tail-follow: new shard files become micro-batches, checkpoint resumes exactly-once") {
    val dir = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("warc_ckpt").toString
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 2)
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    drainStream(dir, ckpt, batches)
    assert(batches.flatten.sorted === docs.collect().map(_.getString(1)).toSeq.sorted)
    // simulate an arriving crawl segment: a second batch of shards
    // lands under foreign names (sink-rewrites clear stale shards, so
    // arrival is modeled by copying under a new prefix, cdx included)
    val late = Seq(("zeta", "urn:x:zeta", "late one"), ("eta", "urn:x:eta", "late two"))
      .toDF("k", "u", "t").select(col("k"), col("u"), col("t").cast("binary").as("p"))
    val tmp2 = freshDir()
    WarcShards.write(late, "k", "u", "p", tmp2, nShards = 1)
    for (f <- new java.io.File(tmp2).listFiles();
         n = f.getName if n.endsWith(".warc.gz") || n.endsWith(".cdx"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(dir, "late-" + n))
    val before = batches.length
    drainStream(dir, ckpt, batches)
    // the resumed run served ONLY the late shards — no duplicates
    assert(batches.drop(before).flatten.sorted === Seq("urn:x:eta", "urn:x:zeta"))
    // a third drain with nothing new serves nothing
    val again = batches.length
    drainStream(dir, ckpt, batches)
    assert(batches.drop(again).flatten.isEmpty)
  }

  test("streaming admission control: maxFilesPerTrigger bounds each batch, AvailableNow drains all") {
    val dir = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("warc_ckpt2").toString
    WarcShards.write(docs, "k", "u", "p", dir, nShards = 4)
    val nShardFiles = new java.io.File(dir).list().count(_.endsWith(".warc.gz"))
    // files that actually hold records (md5 sharding may leave a
    // shard empty at 5 docs / 4 shards)
    val populated = readBack(dir).select("shard").distinct().count()
    assert(populated >= 2)
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    drainStream(dir, ckpt, batches, maxFilesPerTrigger = 1)
    // one file per batch → as many record-bearing batches as
    // populated shard files, and the whole backlog drained
    assert(batches.count(_.nonEmpty) === populated)
    assert(batches.length >= nShardFiles) // every file got its own batch
    assert(batches.flatten.sorted === docs.collect().map(_.getString(1)).toSeq.sorted)
  }

  test("contract errors: duplicate keys and null payloads refuse loudly") {
    val dir = freshDir()
    val dup = Seq(("a", "u1", "x"), ("a", "u2", "y")).toDF("k", "u", "t")
      .select(col("k"), col("u"), col("t").cast("binary").as("p"))
    val e1 = intercept[Exception] { WarcShards.write(dup, "k", "u", "p", dir, nShards = 1) }
    assert(e1.getMessage != null)
    val nul = Seq(("a", "u1", "x"), ("b", "u2", null)).toDF("k", "u", "t")
      .select(col("k"), col("u"), col("t").cast("binary").as("p"))
    val e2 = intercept[Exception] { WarcShards.write(nul, "k", "u", "p", freshDir(), nShards = 1) }
    assert(e2.getMessage != null)
  }

  test("responseText r13: Content-Encoding gzip/deflate/zstd bodies inflate; corrupt/unknown NULL loudly") {
    val dir = freshDir()
    def envelope(ct: String, enc: Option[String], body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
        enc.map(e => s"Content-Encoding: $e\r\n").getOrElse("") +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def record(uri: String, payload: Array[Byte]): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000d>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    def gz(s: String, cs: String = "UTF-8"): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(s.getBytes(cs)); g.close(); out.toByteArray
    }
    def zlib(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(out, d)
      dos.write(s.getBytes("UTF-8")); dos.close(); out.toByteArray
    }
    def rawDeflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(out, d)
      dos.write(s.getBytes("UTF-8")); dos.close(); out.toByteArray
    }
    val page = "the quick brown page body for transfer decoding"
    val payload: Array[Byte] =
      record("http://x/gz", envelope("text/html; charset=UTF-8", Some("gzip"), gz(page))) ++
      record("http://x/zlib", envelope("text/html", Some("deflate"), zlib(page))) ++
      record("http://x/rawdef", envelope("text/html", Some("deflate"), rawDeflate(page))) ++
      // gzip body in a foreign charset: inflate THEN charset-decode
      record("http://x/gzsjis", envelope("text/html; charset=Shift_JIS", Some("gzip"),
        gz("日本語のページ", "Shift_JIS"))) ++
      record("http://x/corrupt", envelope("text/html", Some("gzip"),
        Array[Byte](0x1f, 0x0b, 1, 2, 3))) ++
      record("http://x/br", envelope("text/html", Some("br"), page.getBytes("UTF-8"))) ++
      // zstd: supported since r17 (zstd-jni rides Spark's classpath)
      record("http://x/zstd", envelope("text/html; charset=UTF-8", Some("zstd"),
        com.github.luben.zstd.Zstd.compress(page.getBytes("UTF-8"), 3))) ++
      record("http://x/zstdbad", envelope("text/html", Some("zstd"),
        Array[Byte](1, 2, 3, 4))) ++
      record("http://x/plain", envelope("text/plain", None, page.getBytes("UTF-8")))
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "cc4.warc.gz")))
    out.write(payload); out.close()
    // the declared coding rides its own column
    val enc = spark.read.format("graft.sources.WarcSource").option("path", dir).load()
      .filter(col("warc_type") === "response")
      .select("target_uri", "http_content_encoding").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(enc("http://x/gz") === Some("gzip"))
    assert(enc("http://x/plain") === None)
    val rows = graft.sources.WarcSource.responseText(spark, dir)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(rows("http://x/gz") === Some(page))
    assert(rows("http://x/zlib") === Some(page))
    assert(rows("http://x/rawdef") === Some(page)) // raw-deflate fallback
    assert(rows("http://x/gzsjis") === Some("日本語のページ"))
    assert(rows("http://x/corrupt") === None) // broken member, scan survives
    assert(rows("http://x/br") === None) // undecodable coding -> loud null
    assert(rows("http://x/zstd") === Some(page)) // zstd inflates (r17)
    assert(rows("http://x/zstdbad") === None) // corrupt zstd frame -> loud null
    assert(rows("http://x/plain") === Some(page)) // identity unchanged
  }

  test("responseText r14: chunked Transfer-Encoding bodies deframe; corrupt/unknown NULL loudly") {
    val dir = freshDir()
    def envelope(ct: String, ce: Option[String], te: Option[String],
        body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
        ce.map(e => s"Content-Encoding: $e\r\n").getOrElse("") +
        te.map(e => s"Transfer-Encoding: $e\r\n").getOrElse("") +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def record(uri: String, payload: Array[Byte]): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-00000000000e>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close(); out.toByteArray
    }
    // chunk-frame `b` in pieces of `sz` bytes, hex sizes in the given
    // case, optional chunk extension and trailer lines
    def frame(b: Array[Byte], sz: Int, upper: Boolean = false,
        ext: String = "", trailers: Seq[String] = Nil): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < b.length) {
        val n = math.min(sz, b.length - i)
        val h = if (upper) n.toHexString.toUpperCase else n.toHexString
        out.write((h + ext + "\r\n").getBytes("ISO-8859-1"))
        out.write(b, i, n)
        out.write("\r\n".getBytes("ISO-8859-1"))
        i += n
      }
      out.write(("0\r\n" + trailers.map(_ + "\r\n").mkString + "\r\n")
        .getBytes("ISO-8859-1"))
      out.toByteArray
    }
    val page = "a chunk framed page body that spans several chunks of text"
    val pb = page.getBytes("UTF-8")
    val payload: Array[Byte] =
      // single chunk, plain
      record("http://x/ch1", envelope("text/html; charset=UTF-8", None,
        Some("chunked"), frame(pb, pb.length))) ++
      // multi-chunk with UPPERCASE hex sizes, extension, and trailers
      record("http://x/chN", envelope("text/html", None, Some("chunked"),
        frame(pb, 7, upper = true, ext = ";name=v",
          trailers = Seq("X-Trailer: 1")))) ++
      // Content-Encoding gzip UNDER the chunk framing (the real-web
      // composition: dechunk first, then inflate)
      record("http://x/chgz", envelope("text/html", Some("gzip"),
        Some("chunked"), frame(gz(pb), 11))) ++
      // "gzip, chunked" as a TRANSFER coding list: dechunk, then the
      // pre-chunking transfer gzip unwraps
      record("http://x/tegz", envelope("text/html", None,
        Some("gzip, chunked"), frame(gz(pb), 13))) ++
      // declared chunked but NOT framed -> loud null
      record("http://x/bad", envelope("text/html", None, Some("chunked"),
        ("ZZ\r\n" + page).getBytes("UTF-8"))) ++
      // truncated mid-chunk -> loud null
      record("http://x/trunc", envelope("text/html", None, Some("chunked"),
        frame(pb, pb.length).dropRight(12))) ++
      // unknown transfer coding -> loud null
      record("http://x/gzonly", envelope("text/html", None, Some("gzip"),
        gz(pb))) ++
      // 17-hex-digit chunk size: would overflow parseLong into a
      // NumberFormatException past the IOException null contract ->
      // must NULL, never kill the task
      record("http://x/huge", envelope("text/html", None, Some("chunked"),
        ("11111111111111111\r\n" + page).getBytes("ISO-8859-1")))
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "cc5.warc.gz")))
    out.write(payload); out.close()
    val te = spark.read.format("graft.sources.WarcSource").option("path", dir).load()
      .filter(col("warc_type") === "response")
      .select("target_uri", "http_transfer_encoding").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(te("http://x/ch1") === Some("chunked"))
    assert(te("http://x/tegz") === Some("gzip, chunked"))
    val rows = graft.sources.WarcSource.responseText(spark, dir)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(rows("http://x/ch1") === Some(page))
    assert(rows("http://x/chN") === Some(page))
    assert(rows("http://x/chgz") === Some(page))
    assert(rows("http://x/tegz") === Some(page))
    assert(rows("http://x/bad") === None)
    assert(rows("http://x/trunc") === None)
    assert(rows("http://x/gzonly") === None) // chunked must be the last coding
    assert(rows("http://x/huge") === None) // overflowing size line -> null
  }
}
