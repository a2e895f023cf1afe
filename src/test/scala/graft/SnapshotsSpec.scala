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

  private def tombstone(blockNum: Long, logIdx: Long): String =
    s"""{"address":"0xaaa","topics":["0xsig"],"data":"0x01",""" +
      s""""blockHash":"0xb$blockNum","blockNumber":"0x${blockNum.toHexString}",""" +
      s""""transactionHash":"0xtx$blockNum","transactionIndex":"0x0",""" +
      s""""logIndex":"0x${logIdx.toHexString}","removed":true}"""

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

  test("commitWithRetry: a lost CAS race retries at the next version with a fresh listing") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    // plant a manifest at the version the retrying writer will try
    // first — the simulated concurrent committer that wins the race
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.publish(fs, table, v0 + 1, Snapshots.files(spark, table, v0))
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(2, 0)))), table)
    val v = Snapshots.commitWithRetry(spark, table)
    assert(v === v0 + 2) // first attempt at v0+1 lost, retried
    assert(Snapshots.read(spark, table, Some(v)).count() === 2)
    // pinned history is intact across the contested commit
    assert(Snapshots.read(spark, table, Some(v0)).count() === 1)
  }

  test("a stale listing that raced a rewrite self-revokes instead of resurrecting replaced files") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 3).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    val staleListing = Snapshots.files(spark, table, v0) // pre-rewrite file set
    Logs.compact(spark, table) // parks the originals, auto-commits v1
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 === v0 + 1)
    // the appender whose listing predated the rewrite publishes now:
    // the liveness diff must revoke the manifest, not leave the parked
    // files as latest
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = intercept[java.io.IOException](
      Snapshots.publish(fs, table, v1 + 1, staleListing))
    assert(e.getMessage.contains("raced a rewrite"))
    // self-revoked: the stale manifest is GONE, latest is still the
    // rewrite's version, and both histories read intact
    assert(Snapshots.latestVersion(spark, table).get === v1)
    assert(Snapshots.read(spark, table).count() === 3)
    assert(Snapshots.isValid(spark, table, v0))
    assert(Snapshots.read(spark, table, Some(v0)).count() === 3)
    // and a RE-LISTED commit (what commitWithRetry's next attempt does)
    // succeeds with the post-rewrite file set — all live
    val v2 = Snapshots.commitWithRetry(spark, table)
    assert(Snapshots.files(spark, table, v2).forall(f =>
      new java.io.File(s"$table/$f").exists()), "latest manifest must reference only live files")
  }

  test("racing compactor and appender: no resurrection, pinned reads intact") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 4).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    // appender: staged appends to a FAR block range + snapshot commits,
    // racing the compactor's partition swaps and its recommit
    val appender = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        gate.await(10, TimeUnit.SECONDS)
        (1 to 3).foreach { i =>
          Logs.appendIdempotent(spark,
            Logs.readNdjson(spark, fixture(Seq(row(700000L + i, 0)))), table,
            staged = true)
          Snapshots.commitWithRetry(spark, table)
        }
      }
    })
    val compactor = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        gate.await(10, TimeUnit.SECONDS)
        Logs.compact(spark, table) // parks originals + recommits with retry
      }
    })
    gate.countDown()
    appender.get(180, TimeUnit.SECONDS)
    compactor.get(180, TimeUnit.SECONDS)
    pool.shutdown()
    // no resurrection: every file the surviving latest manifest
    // references is LIVE (none resolve through the retention area)
    val vLast = Snapshots.latestVersion(spark, table).get
    assert(Snapshots.files(spark, table, vLast).forall(f =>
      new java.io.File(s"$table/$f").exists()),
      "latest manifest references parked files — a stale listing won")
    // a quiescent re-snapshot sees all 7 rows exactly once
    val vFinal = Snapshots.commit(spark, table)
    val rows = Snapshots.read(spark, table, Some(vFinal))
      .select("block_number").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(1L, 2L, 3L, 4L, 700001L, 700002L, 700003L))
    // pinned pre-contest version: intact through park + swap
    assert(Snapshots.isValid(spark, table, v0))
    assert(Snapshots.read(spark, table, Some(v0)).count() === 4)
  }

  test("rewrite-vs-rewrite: same-partition rewrites serialize via the lock") {
    val table = Files.createTempDirectory("lock_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(1, 0), row(2, 0), row(100001L, 0)))), table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lockDir = new org.apache.hadoop.fs.Path(s"$table/.graft_rewrite_lock")
    // a concurrent rewriter holds range 0's lock → compacting range 0
    // fails loudly with the retryable conflict, the partition untouched
    fs.mkdirs(lockDir)
    val lock = new org.apache.hadoop.fs.Path(lockDir, "block_range=0.lock")
    val out = fs.create(lock, false)
    out.write("""{"nonce":"foreign","ts":""".getBytes("UTF-8"))
    out.write(s"${System.currentTimeMillis()}}".getBytes("UTF-8"))
    out.close()
    val before = Logs.read(spark, table).count()
    val e = intercept[Exception](Logs.compact(spark, table, ranges = Some(Seq(0L))))
    assert(e.getMessage.contains("rewrite conflict"), e.getMessage)
    assert(Logs.read(spark, table).count() === before)
    // DISJOINT ranges never contend: range 1 compacts fine under range 0's lock
    Logs.compact(spark, table, ranges = Some(Seq(1L)))
    assert(Logs.read(spark, table).count() === before)
    // the foreign lock is NOT released by the failed/disjoint rewrites
    assert(fs.exists(lock))
    // owner releases → the same rewrite proceeds and releases its own lock
    fs.delete(lock, false)
    Logs.compact(spark, table, ranges = Some(Seq(0L)))
    assert(Logs.read(spark, table).count() === before)
    assert(!fs.exists(lock))
    // a STALE lock (crashed rewriter) is broken and reclaimed
    val out2 = fs.create(lock, false)
    out2.write("""{"nonce":"dead","ts":0}""".getBytes("UTF-8"))
    out2.close()
    fs.setTimes(lock, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    Logs.compact(spark, table, ranges = Some(Seq(0L))) // breaks, reclaims, releases
    assert(Logs.read(spark, table).count() === before)
    assert(!fs.exists(lock))
    // N breakers race one stale lock: rename-based break means only one
    // can tombstone the instance; the rest fail with the retryable
    // conflict or acquire AFTER a release. Data intact, no lock or
    // tombstone debris left behind.
    val out3 = fs.create(lock, false)
    out3.write("""{"nonce":"dead2","ts":0}""".getBytes("UTF-8"))
    out3.close()
    fs.setTimes(lock, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(4)
    val outcomes = (1 to 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Option[String]] {
        def call(): Option[String] =
          try { Logs.compact(spark, table, ranges = Some(Seq(0L))); None }
          catch { case e: Exception => Some(e.getMessage) }
      })
    }.map(_.get())
    pool.shutdown()
    assert(outcomes.exists(_.isEmpty), s"no breaker won: $outcomes")
    outcomes.flatten.foreach(m => assert(m.contains("rewrite conflict"), m))
    assert(Logs.read(spark, table).count() === before)
    val debris = fs.listStatus(lockDir).map(_.getPath.getName).toSeq
    assert(debris.isEmpty, s"lock dir debris: $debris")
  }

  test("staged appends serialize against partition rewrites via the kind-aware lock") {
    // Pins the r10 flake class deterministically: a staged append
    // renaming into a partition mid-swap could re-create a dir the
    // rewrite just parked (both swap renames fail) or publish a file
    // the rewrite then parks with the originals (silent loss). The
    // protocol fix: appends take the SAME per-range lock as rewrites,
    // and WAIT out a rewrite holder instead of racing or failing.
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lockDir = new org.apache.hadoop.fs.Path(s"$table/.graft_rewrite_lock")
    fs.mkdirs(lockDir)
    // a REWRITE holds range 0's lock (kind field absent = foreign /
    // pre-r11 rewriter — the conservative reading)
    val lock = new org.apache.hadoop.fs.Path(lockDir, "block_range=0.lock")
    val out = fs.create(lock, false)
    out.write(s"""{"nonce":"rewriter","ts":${System.currentTimeMillis()}}""".getBytes("UTF-8"))
    out.close()
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val t0 = System.nanoTime()
    val append = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = Logs.appendIdempotent(spark,
        Logs.readNdjson(spark, fixture(Seq(row(2, 0)))), table, staged = true)
    })
    // the appender is WAITING on the lock, not failing and not done
    Thread.sleep(1500)
    assert(!append.isDone, "staged append must wait out a rewrite lock, not race it")
    fs.delete(lock, false) // rewriter releases
    append.get(60, TimeUnit.SECONDS) // append proceeds and lands
    assert((System.nanoTime() - t0) / 1e9 < 60)
    assert(Logs.read(spark, table).count() === 2)
    // symmetric direction: an APPEND-kind holder makes a rewrite WAIT
    // (appends hold for seconds) instead of failing fast
    val out2 = fs.create(lock, false)
    out2.write(s"""{"nonce":"appender","kind":"append","ts":${System.currentTimeMillis()}}"""
      .getBytes("UTF-8"))
    out2.close()
    val compactF = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = Logs.compact(spark, table, ranges = Some(Seq(0L)))
    })
    Thread.sleep(1500)
    assert(!compactF.isDone, "rewrite must wait out an append-kind lock")
    fs.delete(lock, false) // appender releases
    compactF.get(60, TimeUnit.SECONDS)
    pool.shutdown()
    assert(Logs.read(spark, table).count() === 2)
    // no lock debris from either waiter
    assert(fs.listStatus(lockDir).isEmpty)
  }

  test("two parallel append-only writers both commit; history holds both appends") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(1, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    // two writers: disjoint block ranges (far apart → different
    // block_range partitions), append then commit simultaneously.
    // staged=true is the concurrent form — each writer stages in a
    // private dir, so neither can clobber the other's _temporary tree
    def writer(blocks: Seq[Long]) = pool.submit(
      new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await(10, TimeUnit.SECONDS)
          Logs.appendIdempotent(spark,
            Logs.readNdjson(spark, fixture(blocks.map(row(_, 0)))), table,
            staged = true)
          Snapshots.commitWithRetry(spark, table)
        }
      })
    val (fa, fb) = (writer(Seq(10L, 11L)), writer(Seq(500000L, 500001L)))
    gate.countDown()
    val (va, vb) = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // both writers succeeded, on DISTINCT versions (the CAS contract)
    assert(va !== vb)
    // the later committed version sees every row from both appends
    // (its listing ran after both writers' data landed or after its
    // own; the FINAL version always has both — commit re-lists)
    val vLast = Snapshots.latestVersion(spark, table).get
    val vFinal = Snapshots.commit(spark, table) // quiescent re-snapshot
    assert(Snapshots.read(spark, table, Some(vFinal)).count() === 5)
    assert(vLast === math.max(va, vb))
    // every version in the contested history is valid and readable
    (v0 to vFinal).foreach { v =>
      assert(Snapshots.isValid(spark, table, v), s"v$v invalid")
      assert(Snapshots.read(spark, table, Some(v)).count() >= 1)
    }
    // pinned pre-contest read is undisturbed
    assert(Snapshots.read(spark, table, Some(v0)).count() === 1)
  }

  test("diff: appends read as added, reversed as removed, and only changed files are scanned") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(row(1, 0), row(2, 0), row(3, 0)))), table)
    val v0 = Snapshots.commit(spark, table)
    Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(4, 0)))), table)
    val v1 = Snapshots.commit(spark, table)
    val d = Snapshots.diff(spark, table, v0, v1)
    assert(d.collect().map(r => (r.getString(0), r.getString(3))).toSeq
      === Seq(("0xb4", "added")))
    // manifest pruning: the three v0 files are COMMON to both
    // manifests and must not be scanned at all
    val scannedNames = d.inputFiles.map(_.split('/').last).toSet
    val commonNames = Snapshots.files(spark, table, v0).map(_.split('/').last).toSet
    assert(commonNames.nonEmpty && commonNames.forall(n => !scannedNames(n)),
      s"scanned=$scannedNames common=$commonNames")
    // direction flip: added becomes removed
    assert(Snapshots.diff(spark, table, v1, v0).collect()
      .map(r => (r.getString(0), r.getString(3))).toSeq === Seq(("0xb4", "removed")))
    // same version: nothing differs by construction
    assert(Snapshots.diff(spark, table, v0, v0).count() === 0)
  }

  test("diff: a pure compaction diffs empty; a canonicalize tombstone diffs as changed") {
    val table = Files.createTempDirectory("snap_tbl").toString + "/t"
    (1 to 4).foreach { i =>
      Logs.appendIdempotent(spark, Logs.readNdjson(spark, fixture(Seq(row(i, 0)))), table)
    }
    val v0 = Snapshots.commit(spark, table)
    Logs.compact(spark, table) // every file moves, no row changes
    val v1 = Snapshots.latestVersion(spark, table).get
    assert(v1 > v0)
    assert(Snapshots.diff(spark, table, v0, v1).count() === 0)
    // reorg canonicalization flips one key's payload (removed=true)
    Logs.appendIdempotent(spark, Logs.readNdjson(spark,
      fixture(Seq(tombstone(2, 0)))), table, canonicalize = true)
    val v2 = Snapshots.latestVersion(spark, table).get
    val d = Snapshots.diff(spark, table, v0, v2).collect()
    assert(d.map(r => (r.getString(0), r.getString(3))).toSet === Set(("0xb2", "changed")))
  }
}
