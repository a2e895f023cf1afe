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

  test("compact retains replaced files: pinned readers survive, next version auto-commits") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 4).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    assert(Snapshots.isValid(spark, table, v0))
    Logs.compact(spark, table) // rewrites partition files in place
    // MVCC: the rewrite PARKED the replaced files — the pinned version
    // is still valid and still reads its exact pre-compact state
    assert(Snapshots.isValid(spark, table, v0))
    assert(Snapshots.read(spark, table, Some(v0)).count() === 4)
    assert(Snapshots.read(spark, table, Some(v0))
      .select("block_number").collect().map(_.getLong(0)).sorted.toSeq === (1L to 4L))
    // and the rewrite published the next version itself — zero manual steps
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 === v0 + 1)
    assert(Snapshots.isValid(spark, table, v1))
    assert(Snapshots.read(spark, table, Some(v1)).count() === 4)
  }

  test("canonical swap-rewrite: pinned version reads PRE-tombstone state; untracked tables unaffected") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0), row(2, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    // tombstone an existing PK → appendCanonical swap-rewrites the partition
    val tomb = Logs.readNdjson(spark, fixture(Seq(
      row(2, 0).replace("\"removed\":false", "\"removed\":true"))))
    Logs.appendCanonical(spark, tomb, table)
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 === v0 + 1 && Snapshots.isValid(spark, table, v1))
    // time travel across the reorg: v0 still shows block 2 un-tombstoned
    assert(Snapshots.isValid(spark, table, v0))
    val v0rows = Snapshots.read(spark, table, Some(v0))
      .select("block_number", "removed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v0rows === Map(1L -> false, 2L -> false))
    assert(Logs.canonical(Snapshots.read(spark, table, Some(v1))).count() === 1)
    // a table that never committed a snapshot gets none forced on it
    val bare = Files.createTempDirectory("snap_bare").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), bare)
    Logs.compact(spark, bare)
    assert(Snapshots.latestVersion(spark, bare).isEmpty)
    // and no retention area appears on untracked tables
    assert(!new java.io.File(s"$bare/_graft_retained").exists())
  }

  test("vacuum drops old manifests and unreferenced retained files") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 3).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    Logs.compact(spark, table) // auto-commits v1; originals parked
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(new java.io.File(s"$table/_graft_retained").exists())
    val (droppedManifests, deletedFiles) = Snapshots.vacuum(spark, table, keepVersions = 1)
    assert(droppedManifests === 1 && deletedFiles > 0)
    // the vacuumed version is gone; the kept one still reads fine
    intercept[IllegalArgumentException](Snapshots.files(spark, table, v0))
    assert(Snapshots.read(spark, table, Some(v1)).count() === 3)
    // retained area fully GC'd (nothing still references it)
    assert(!new java.io.File(s"$table/_graft_retained").exists())
    // idempotent: a second vacuum is a no-op
    assert(Snapshots.vacuum(spark, table, keepVersions = 1) === ((0, 0)))
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
