package graft

import graft.sources.Logs
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Pipeline invariants from FIXTURES.md §2: double-ingest leaves the
  * row count unchanged (PK idempotence, schema.sql:51); resume starts
  * from max(block_number) (main.go:206-215); reorg canonicalization
  * drops tombstones. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(rows: Seq[String]): String = {
    val p = Files.createTempFile("logs", ".ndjson")
    Files.writeString(p, rows.mkString("\n"))
    p.toString
  }

  private def row(blockNum: Long, logIdx: Long, removed: Boolean = false): String =
    s"""{"address":"0xaaa","topics":["0xsig","0xt1"],"data":"0x01",""" +
      s""""blockHash":"0xb$blockNum","blockNumber":"0x${blockNum.toHexString}",""" +
      s""""transactionHash":"0xtx$blockNum","transactionIndex":"0x0",""" +
      s""""logIndex":"0x${logIdx.toHexString}","removed":$removed}"""

  test("wire transform: topics split, data nulling, hex casts") {
    val path = fixture(Seq(
      """{"address":"0xa","topics":["0xs"],"data":"0x","blockHash":"0xb","blockNumber":"0x10","transactionHash":"0xt","transactionIndex":"0x2","logIndex":"0x3","removed":false}"""))
    val df = Logs.readNdjson(spark, path)
    val r = df.collect()(0)
    assert(df.schema === Logs.schema)
    assert(r.getAs[String]("topic0") === "0xs")
    assert(r.getAs[String]("topic1") === null) // short topics → null
    assert(r.getAs[String]("data") === null)   // "0x" → null (get_logs.go:44-46)
    assert(r.getAs[Long]("block_number") === 16L)
    assert(r.getAs[Long]("transaction_index") === 2L)
    assert(r.getAs[Long]("log_index") === 3L)
  }

  test("idempotent append: double-ingest row count unchanged") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    val batch = Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(1, 1), row(2, 0))))
    Logs.appendIdempotent(spark, batch, table)
    assert(Logs.read(spark, table).count() === 3)
    // replay the same window (at-least-once delivery) → no new rows
    Logs.appendIdempotent(spark, batch, table)
    assert(Logs.read(spark, table).count() === 3)
    // overlapping window with one genuinely new row
    val batch2 = Logs.readNdjson(spark, fixture(Seq(row(2, 0), row(3, 0))))
    Logs.appendIdempotent(spark, batch2, table)
    assert(Logs.read(spark, table).count() === 4)
  }

  test("appends write parquet bloom filters on address and topic0") {
    val table = Files.createTempDirectory("blooms").toString + "/t"
    // parquet only materializes a bloom once a column chunk stops being
    // fully dictionary-encoded (the dictionary is already an exact
    // membership filter). Real address cardinality overflows the 1 MB
    // dictionary page at scale; emulate that with a tiny page budget
    // and per-row distinct addresses.
    val conf = spark.sparkContext.hadoopConfiguration
    val prevDict = conf.get("parquet.dictionary.page.size")
    conf.setInt("parquet.dictionary.page.size", 512)
    try {
      val wire = (1L to 400L).map { b =>
        s"""{"address":"0xaddr$b","topics":["0xsig$b","0xt1"],"data":"0x01",""" +
          s""""blockHash":"0xb$b","blockNumber":"0x${b.toHexString}",""" +
          s""""transactionHash":"0xtx$b","transactionIndex":"0x0",""" +
          s""""logIndex":"0x0","removed":false}"""
      }
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(wire)), table)
    } finally {
      if (prevDict == null) conf.unset("parquet.dictionary.page.size")
      else conf.set("parquet.dictionary.page.size", prevDict)
    }
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$table/block_range=0"))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(files.head.getPath, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val byCol = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      // bloom offset >= 0 means a filter was written for the column
      assert(byCol("address").getBloomFilterOffset >= 0, "address bloom missing")
      assert(byCol("topic0").getBloomFilterOffset >= 0, "topic0 bloom missing")
      assert(byCol("data").getBloomFilterOffset < 0, "unexpected bloom on data")
      // and it answers membership: present address hits, absent misses
      val bloom = reader.getBloomFilterDataReader(block)
        .readBloomFilter(byCol("address"))
      def hit(s: String) = bloom.findHash(bloom.hash(
        org.apache.parquet.io.api.Binary.fromString(s)))
      assert(hit("0xaddr7"))
      assert(!hit("0xdefinitely-not-present"))
    } finally reader.close()
  }

  test("high-water mark resume (main.go:162-175)") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    assert(Logs.highWaterMark(spark, table) === 0L) // empty → 0
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(5, 0), row(9, 0)))), table)
    assert(Logs.highWaterMark(spark, table) === 9L)
  }

  test("canonical view: latest-per-PK wins, removed tombstones drop") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(2, 0)))), table)
    // a reorg marks block 2's log removed — arrives as a new version
    val reorg = Logs.readNdjson(spark, fixture(Seq(row(2, 0, removed = true))))
    // tombstone differs only in `removed` → same PK; appendIdempotent would
    // DO-NOTHING it, so reorg handling writes through canonical():
    val all = Logs.read(spark, table).unionByName(reorg)
    val canon = Logs.canonical(all)
    assert(canon.count() === 1)
    assert(canon.select("block_number").as[Long].collect().toSeq === Seq(1L))
  }

  test("compaction merges micro-batch files, preserves rows and layout") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    // 5 tiny appends → many small files in one partition
    (1 to 5).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    def dataFiles() = new java.io.File(s"$table/block_range=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles() >= 5)
    Logs.compact(spark, table)
    assert(dataFiles() === 1)
    val rows = Logs.read(spark, table)
    assert(rows.count() === 5)
    assert(Logs.highWaterMark(spark, table) === 5L)
    // still idempotent afterwards
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(3, 0)))), table)
    assert(Logs.read(spark, table).count() === 5)
  }

  test("canonicalizing append: same-PK tombstone actually deletes (get_logs.go:107)") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(2, 0)))), table)
    // a tombstone reusing block 2's stored PK — plain append DO-NOTHINGs it
    val tomb = Logs.readNdjson(spark, fixture(Seq(row(2, 0, removed = true))))
    Logs.appendIdempotent(spark, tomb, table)
    assert(Logs.canonical(Logs.read(spark, table)).count() === 2) // blind spot
    // canonicalizing write path lands it
    Logs.appendIdempotent(spark, tomb, table, canonicalize = true)
    val stored = Logs.read(spark, table)
    assert(stored.count() === 2) // one version per PK, tombstone kept
    assert(stored.filter(col("removed")).count() === 1)
    assert(Logs.canonical(stored).select("block_number").as[Long].collect().toSeq === Seq(1L))
    // an at-least-once replay of the ORIGINAL insert cannot resurrect it
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(2, 0)))), table,
      canonicalize = true)
    assert(Logs.canonical(Logs.read(spark, table)).count() === 1)
    // and a batch spanning a stored + a brand-new partition works
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(3, 0), row(100001L, 0)))), table, canonicalize = true)
    assert(Logs.canonical(Logs.read(spark, table)).count() === 3)
    assert(Logs.highWaterMark(spark, table) === 100001L)
  }

  test("canonicalizing append rewrites ONLY the partitions the batch touches") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    // two ranges: block 5 → range 0, block 100005 → range 1
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(5, 0), row(100005L, 0)))), table)
    def fileState(r: Long) = new java.io.File(s"$table/block_range=$r")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
    val range1Before = fileState(1)
    // tombstone touches range 0 only — range 1's files must be byte-identical
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(5, 0, removed = true)))), table, canonicalize = true)
    assert(fileState(1) === range1Before) // untouched partition not rewritten
    assert(fileState(0) !== Seq.empty)
    assert(Logs.canonical(Logs.read(spark, table)).select("block_number")
      .as[Long].collect().toSeq === Seq(100005L))
  }

  test("compaction handles many ranges concurrently with a size target") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    // three block_range partitions (100k blocks each), several files per range
    val blocks = Seq(1L, 2L, 100001L, 100002L, 200001L, 200002L, 200003L)
    blocks.foreach { b =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(b, 0)))), table)
    }
    def dataFiles(r: Long) = new java.io.File(s"$table/block_range=$r")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles(0) >= 2 && dataFiles(1) >= 2 && dataFiles(2) >= 3)
    // stale tmp from a hypothetical crashed run must not break anything
    val staleTmp = new java.io.File(s"$table/.graft_compact_tmp/block_range=0")
    staleTmp.mkdirs()
    Files.writeString(staleTmp.toPath.resolve("garbage"), "not parquet")
    Logs.compact(spark, table, parallelism = 3)
    assert(dataFiles(0) === 1 && dataFiles(1) === 1 && dataFiles(2) === 1)
    assert(!new java.io.File(s"$table/.graft_compact_tmp").exists())
    assert(!new java.io.File(s"$table/.graft_compact_bak").exists())
    assert(Logs.read(spark, table).count() === blocks.size)
    // a tiny file-size target splits a range into multiple output files
    Logs.compact(spark, table, ranges = Some(Seq(2L)), targetFileBytes = 1024L)
    assert(dataFiles(2) >= 2)
    assert(Logs.read(spark, table).count() === blocks.size)
  }

  test("reads race-safe against a table dir with no committed files") {
    // a status probe (StreamLogs stats loop) or crash-resume can hit the
    // table dir while only _temporary exists — must read as empty, not throw
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    new java.io.File(s"$table/_temporary/0").mkdirs()
    assert(Logs.highWaterMark(spark, table) === 0L)
    assert(Logs.read(spark, table).count() === 0L)
    assert(Logs.read(spark, table).schema === Logs.schema)
    // and the first append still works on the half-created dir
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), table)
    assert(Logs.read(spark, table).count() === 1L)
  }

  test("high-water mark prunes to the max block_range partition") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(7, 0), row(100005L, 0), row(250007L, 0)))), table)
    // global max (250007) lives in block_range=2; the pruned scan must find it
    assert(Logs.highWaterMark(spark, table) === 250007L)
  }

  test("price probe ingest: wire decode, streaming idempotence, as-of ready") {
    import graft.sources.Price
    val in = Files.createTempDirectory("price_in").toString
    val table = Files.createTempDirectory("price_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("price_ckpt").toString
    def probe(block: Long, priceUsd8: Long) =
      s"""{"token":"0xtok1","blockNumber":"0x${block.toHexString}",""" +
        s""""result":"0x${"%064x".format(priceUsd8)}"}"""
    Files.writeString(java.nio.file.Paths.get(s"$in/p1.ndjson"),
      Seq(probe(100, 4215000000L), probe(200, 4301000000L)).mkString("\n"))
    val q = Price.ingest(spark, in, table, ckpt)
    q.awaitTermination()
    val rows = spark.read.parquet(table).orderBy("block_number").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("address") === "0xtok1")
    assert(rows(0).getAs[Long]("block_number") === 100L)
    assert(rows(0).getAs[java.math.BigDecimal]("price").longValue === 4215000000L)
    // replay window (overlap) → PK DO-NOTHING
    Files.writeString(java.nio.file.Paths.get(s"$in/p2.ndjson"),
      Seq(probe(200, 4301000000L), probe(300, 4350000000L)).mkString("\n"))
    val q2 = Price.ingest(spark, in, table, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(table).count() === 3)
  }

  test("partition layout: block_range partitions exist and prune") {
    val table = Files.createTempDirectory("logs_tbl").toString + "/t"
    val far = Logs.blocksPerPartition * 3 + 7
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(far, 0)))), table)
    val dirs = new java.io.File(table).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("block_range=0", "block_range=3"))
    // range predicate should only read the matching partition
    val plan = spark.read.parquet(table)
      .filter(col("block_number") >= far)
      .queryExecution.executedPlan.toString
    assert(Logs.read(spark, table).filter(col("block_number") >= far).count() === 1)
  }
}
