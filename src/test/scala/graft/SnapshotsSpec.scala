package graft

import graft.sources.{Logs, Snapshots}
import java.nio.file.Files

/** Append-level MVCC over the partitioned logs table: pinned reads,
  * time travel, invalidation after in-place rewrites. */
class SnapshotsSpec extends SparkSpec {

  private def fixture(rows: Seq[String]): String = {
    val p = Files.createTempFile("logs", ".ndjson")
    Files.writeString(p, rows.mkString("\n"))
    p.toString
  }

  private def row(blockNum: Long, logIdx: Long): String =
    s"""{"address":"0xaaa","topics":["0xsig"],"data":"0x01",""" +
      s""""blockHash":"0xb$blockNum","blockNumber":"0x${blockNum.toHexString}",""" +
      s""""transactionHash":"0xtx$blockNum","transactionIndex":"0x0",""" +
      s""""logIndex":"0x${logIdx.toHexString}","removed":false}"""

  test("pinned snapshot ignores concurrent appends; time travel reads history") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(2, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    // ingest keeps going — an analytic job pinned to v0 must not see it
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(3, 0), row(100001L, 0)))), table)
    assert(Snapshots.read(spark, table, Some(v0)).count() === 2)
    assert(Logs.read(spark, table).count() === 4) // live read sees everything
    val v1 = Snapshots.commit(spark, table)
    assert(v1 === v0 + 1)
    assert(Snapshots.read(spark, table, Some(v1)).count() === 4)
    assert(Snapshots.read(spark, table).count() === 4) // default = latest
    // both versions remain valid and readable (append-only history)
    assert(Snapshots.isValid(spark, table, v0))
    assert(Snapshots.read(spark, table, Some(v0)).count() === 2)
    // the pinned read keeps the analytic schema
    assert(Snapshots.read(spark, table, Some(v0)).schema === Logs.schema)
  }

  test("compact invalidates older snapshots AND auto-commits a fresh valid one") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 4).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    assert(Snapshots.isValid(spark, table, v0))
    Logs.compact(spark, table) // rewrites partition files in place
    assert(!Snapshots.isValid(spark, table, v0)) // detectably stale
    // the rewrite published the next version itself — zero manual steps
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 === v0 + 1)
    assert(Snapshots.isValid(spark, table, v1))
    assert(Snapshots.read(spark, table, Some(v1)).count() === 4)
  }

  test("canonical swap-rewrite re-pins; untracked tables stay manifest-free") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(2, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    // tombstone an existing PK → appendCanonical swap-rewrites the partition
    val tomb = Logs.readNdjson(spark, fixture(Seq(
      row(2, 0).replace("\"removed\":false", "\"removed\":true"))))
    Logs.appendCanonical(spark, tomb, table)
    assert(!Snapshots.isValid(spark, table, v0))
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 === v0 + 1 && Snapshots.isValid(spark, table, v1))
    // a table that never committed a snapshot gets none forced on it
    val bare = Files.createTempDirectory("snap_bare").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), bare)
    Logs.compact(spark, bare)
    assert(Snapshots.latestVersion(spark, bare).isEmpty)
  }

  test("commit detects a concurrent committer racing to the same version") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    // simulate the race at the only window it can happen: the other
    // committer's manifest lands AFTER this one computed its version
    // but BEFORE its rename — publish directly with the stale number
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = intercept[java.io.IOException](
      Snapshots.publish(fs, table, v0, Seq.empty))
    assert(e.getMessage.contains("conflict"))
  }
}
