package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Persisted-index lifecycle hardening (r13): the shared
  * [[graft.util.DirLock]] discipline over index writes and
  * [[Dedup.compactIndex]], the rename-away → rename-in → delete-old
  * swap (no window with no index at `path`), recursive file counting
  * and partition-layout preservation for partitioned indexes (the
  * bloom `word_range` layout read 0 top-level files in r12 and
  * silently no-op'd). */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("compactIndex preserves a partitioned layout and counts files recursively") {
    val dir = tmp("idxp") + "/bloom"
    val keys = (1L to 2000L).map(i => s"k$i").toDF("key")
    // wordRanges=8 → 8 word_range partition dirs; files live in
    // subdirs, so the r12 top-level count saw 0 and no-op'd
    Dedup.bloomWriteIndex(keys, "key", dir, mBits = 1L << 12, k = 3, wordRanges = 8)
    val before = Dedup.bloomProbeIndex(
      keys.limit(50).unionByName(Seq("absent1", "absent2").toDF("key")),
      "key", dir).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("maybe_seen")).toMap
    val (nb, na) = Dedup.compactIndex(spark, dir, targetFiles = 4)
    assert(nb >= 8, s"recursive count must see partitioned files, got $nb")
    assert(na <= 8, s"after=$na") // one file per partition value
    // layout survived: word_range dirs still present → partition
    // pruning still plans
    val sub = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(sub.count(_.startsWith("word_range=")) === 8, sub.mkString(","))
    // probes identical through the compacted index
    val after = Dedup.bloomProbeIndex(
      keys.limit(50).unionByName(Seq("absent1", "absent2").toDF("key")),
      "key", dir).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("maybe_seen")).toMap
    assert(after === before)
  }

  test("compactIndex clears a prior crash's leftovers and leaves none on success") {
    val dir = tmp("idxc") + "/sig"
    Dedup.hammingWriteIndex((1L to 20L).map(i => (i, i * 37L)).toDF("id", "sh"),
      dir, "test-v1", 64)
    for (b <- 1 to 3)
      Dedup.hammingWriteIndex(Seq((100L + b, b * 91L)).toDF("id", "sh"),
        dir, "test-v1", 64, mode = "append")
    // fake a crashed prior compaction: stale .old and .compact dirs
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".compact"))
    val (nb, na) = Dedup.compactIndex(spark, dir, targetFiles = 1)
    assert(nb >= 4 && na <= 1, s"$nb -> $na")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")), ".old must be gone")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact")), ".compact must be gone")
    val ids = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(ids === ((1L to 20L) ++ Seq(101L, 102L, 103L)).toSet)
  }

  test("a held rewrite lock makes a second compactor fail fast and loudly") {
    val dir = tmp("idxl") + "/sig"
    Dedup.hammingWriteIndex((1L to 5L).map(i => (i, i)).toDF("id", "sh"),
      dir, "test-v1", 64)
    for (b <- 1 to 2)
      Dedup.hammingWriteIndex(Seq((10L + b, b * 7L)).toDF("id", "sh"),
        dir, "test-v1", 64, mode = "append")
    // plant a FRESH foreign rewrite lock where DirLock.withIndexLock
    // looks: sibling .graft_index_lock dir of the index's parent
    val p = new org.apache.hadoop.fs.Path(dir)
    val lockDir = new org.apache.hadoop.fs.Path(p.getParent, ".graft_index_lock")
    fs.mkdirs(lockDir)
    val lock = new org.apache.hadoop.fs.Path(lockDir, s"${p.getName}.lock")
    val out = fs.create(lock, true)
    out.write(s"""{"nonce":"foreign","kind":"rewrite","ts":${System.currentTimeMillis()}}"""
      .getBytes("UTF-8"))
    out.close()
    val e = intercept[java.io.IOException](Dedup.compactIndex(spark, dir, targetFiles = 1))
    assert(e.getMessage.contains("rewrite conflict"), e.getMessage)
    fs.delete(lock, false)
    // released: the same compaction now proceeds
    val (nb, na) = Dedup.compactIndex(spark, dir, targetFiles = 1)
    assert(nb >= 3 && na <= 1)
  }

  test("concurrent appenders and a compactor serialize: no lost rows, marker intact") {
    val dir = tmp("idxr") + "/sig"
    Dedup.hammingWriteIndex((1L to 50L).map(i => (i, i * 13L)).toDF("id", "sh"),
      dir, "race-v1", 64)
    // 2 appender threads × 3 appends racing 2 compactions — every
    // append lands whole or the thread dies (none may: appends WAIT
    // for rewrites under the kind-aware protocol)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          for (b <- 0 until 3) {
            val base = 1000L + t * 100L + b * 10L
            Dedup.hammingWriteIndex(
              (base until base + 5L).map(i => (i, i * 7L)).toDF("id", "sh"),
              dir, "race-v1", 64, mode = "append")
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    } :+ new Thread(() => {
      try {
        for (_ <- 0 until 2) { Dedup.compactIndex(spark, dir, targetFiles = 1); Thread.sleep(30) }
      } catch {
        case e: java.io.IOException if e.getMessage.contains("rewrite conflict") => ()
        case e: Throwable => errs.add(e)
      }
    })
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    assert(errs.isEmpty, errs.toArray.mkString("\n"))
    spark.catalog.refreshByPath(dir)
    val ids = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    val expected = (1L to 50L).toSet ++
      (for (t <- 0 until 2; b <- 0 until 3; i <- 0 until 5)
        yield 1000L + t * 100L + b * 10L + i).toSet
    assert(ids === expected, s"missing=${expected -- ids} extra=${ids -- expected}")
    // family marker survived the interleaving
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalHammingCandidates(spark, Seq((9999L, 5L)).toDF("id", "sh"),
        dir, "other-family", 64, 2, 8, 100).collect()
    }
    assert(e.getMessage.contains("families are not interchangeable"))
  }
}
