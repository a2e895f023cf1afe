package graft.sources

import graft.functions.Abi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `logs` fact table: wire schema, ingest transforms, idempotent
  * append, resume, and reorg canonicalization.
  *
  * Reference semantics being reproduced (Spark-first, not ported):
  * - wire record = `eth_getLogs` result object (`get_logs.go:11-21`)
  * - ingest transform = topics[4] → topic0..3 columns, `"0x"`/empty
  *   data → null, hex → decimal indexes (`get_logs.go:38-55`)
  * - idempotence = PK `(block_hash, transaction_hash, log_index)` with
  *   `ON CONFLICT DO NOTHING` (`get_logs.go:118-120`, `schema.sql:51`)
  * - resume = `select max(block_number) from logs` (`main.go:162-175`)
  * - reorg tombstones = `removed` flag stored verbatim; the reference
  *   leaves handling as a todo (`get_logs.go:107`) — we define it:
  *   latest write per PK wins, `removed=true` rows drop out of the
  *   canonical view.
  *
  * Scale design: the table is laid out as Parquet partitioned by
  * `block_range` (block_number / blocksPerPartition). Every operation
  * here — idempotent append's anti-join, the high-water-mark scan,
  * reorg dedup — prunes to the block partitions it touches, so cost
  * tracks batch size, not table size (100 TB-safe). Within a
  * partition, files are sorted by (address, topic0): the stand-in for
  * the reference's 9 btree indexes (`schema.sql:54-62`) via parquet
  * min/max + dictionary pushdown.
  */
object Logs {

  /** `eth_getLogs` result element, as on the wire (`get_logs.go:11-21`,
    * `README.md:15-32`): all numerics 0x-hex strings, topics a 0-4
    * element array. */
  val wireSchema: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("data", StringType),
    StructField("blockHash", StringType),
    StructField("blockNumber", StringType),
    StructField("transactionHash", StringType),
    StructField("transactionIndex", StringType),
    StructField("logIndex", StringType),
    StructField("removed", BooleanType)))

  /** Analytic schema (`schema.sql:36-52` / FIXTURES.md §2). */
  val schema: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("topic0", StringType),
    StructField("topic1", StringType),
    StructField("topic2", StringType),
    StructField("topic3", StringType),
    StructField("data", StringType),
    StructField("block_hash", StringType),
    StructField("block_number", LongType),
    StructField("transaction_hash", StringType),
    StructField("transaction_index", LongType),
    StructField("log_index", LongType),
    StructField("removed", BooleanType),
    StructField("block_timestamp", TimestampType)))

  /** Idempotence contract (`schema.sql:51`). */
  val pk: Seq[String] = Seq("block_hash", "transaction_hash", "log_index")

  /** Blocks per physical partition. ~2k blocks ≈ one Parquet file of
    * event logs on a busy chain; tune per deployment. */
  val blocksPerPartition: Long = 100000L

  /** P1-P3: wire records → analytic rows. Topics split positionally
    * (`get_logs.go:38-43`); short topic arrays yield nulls (vs the
    * reference's Go `[4]string` empty strings — views only test
    * topic0, so the normalization is observationally equivalent and
    * null is the honest SQL value). `block_timestamp` stays null: the
    * reference loader never populates it (`get_logs.go:118-119`). */
  def fromWire(raw: DataFrame): DataFrame = raw.select(
    col("address"),
    element_at(col("topics"), 1).as("topic0"),
    element_at(col("topics"), 2).as("topic1"),
    element_at(col("topics"), 3).as("topic2"),
    element_at(col("topics"), 4).as("topic3"),
    when(col("data").isin("0x", ""), lit(null).cast(StringType))
      .otherwise(col("data")).as("data"),
    col("blockHash").as("block_hash"),
    Abi.hexToLong(col("blockNumber")).as("block_number"),
    col("transactionHash").as("transaction_hash"),
    Abi.hexToLong(col("transactionIndex")).as("transaction_index"),
    Abi.hexToLong(col("logIndex")).as("log_index"),
    col("removed"),
    lit(null).cast(TimestampType).as("block_timestamp"))

  /** Batch replay of an NDJSON RPC capture (fixture format per
    * `curl-get-logs-moonbeam-loop.sh:6,16`). */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    fromWire(spark.read.schema(wireSchema).json(path))

  /** `block_timestamp` backfill (extension beyond the reference,
    * SURVEY §7.4 — the reference declares the column and projects
    * `evt_block_time` in every view but never fills it,
    * `get_logs.go:118-119`): left-join block-header timestamps onto a
    * batch by block_number. The header side is per-window bounded
    * (one row per distinct block), so it broadcasts — no shuffle of
    * the log rows. Blocks absent from `blocks` keep a null
    * timestamp. */
  def withBlockTimestamps(batch: DataFrame, blocks: DataFrame): DataFrame =
    batch.drop("block_timestamp")
      .join(broadcast(blocks.select(col("block_number").as("_bn"),
        col("block_timestamp").as("_bts"))),
        col("block_number") === col("_bn"), "left")
      .withColumn("block_timestamp", col("_bts"))
      .select(schema.fieldNames.map(col): _*)

  private def withBlockRange(df: DataFrame): DataFrame =
    df.withColumn("block_range", (col("block_number") / blocksPerPartition).cast(LongType))

  /** Every logs write goes through this writer: parquet BLOOM FILTERS
    * on `address` and `topic0` — the reference's btree-index analog
    * for POINT predicates (`schema.sql:54-62` indexes exactly these).
    * Min/max stats barely prune on high-cardinality hex strings
    * (ranges overlap across row groups even sorted); a bloom filter
    * answers "this row group has no rows for contract X" directly, so
    * a per-contract scan at 100 TB skips row groups the sort order
    * can't exclude. NDVs are per-ROW-GROUP expectations (addresses
    * bounded by the 100k-block range partition, topic0 by the event-
    * signature universe); ~10 bits/value at the default 1% fpp ≈
    * 0.1% file overhead. Dictionary + sort stay as-is — blooms are
    * additive. */
  private def bloomWriter(df: DataFrame): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.write
      .option("parquet.bloom.filter.enabled#address", "true")
      .option("parquet.bloom.filter.expected.ndv#address", "100000")
      .option("parquet.bloom.filter.enabled#topic0", "true")
      .option("parquet.bloom.filter.expected.ndv#topic0", "10000")

  /** S5: idempotent append — the engine's `INSERT … ON CONFLICT DO
    * NOTHING`. New rows are anti-joined against ONLY the existing
    * block-range partitions the batch overlaps (partition pruning keeps
    * this O(batch), not O(table)), then appended partitioned by
    * block_range and sorted by (address, topic0) within files.
    *
    * `staged = true` is the CONCURRENT-WRITER form (the reference runs
    * any number of parallel archivers against Postgres; per-chain
    * deploys encourage it): the batch is written to a private
    * `_graft_stage/<uuid>` directory — so concurrent jobs never share
    * a `_temporary` tree, the classic lost-files hazard of parallel
    * FileOutputCommitter appends — and the finished files are then
    * renamed into the live partition dirs under stage-unique names
    * (metadata-only on HDFS/local). Two writers racing the SAME PK can
    * both land it (each one's anti-join probe predates the other's
    * rename); that duplicate is exactly what the canonical read path
    * and compaction dedup by PK, same as re-delivered batches. Pair
    * with [[Snapshots.commitWithRetry]] for the snapshot step. */
  def appendIdempotent(spark: SparkSession, batch: DataFrame, tablePath: String,
      canonicalize: Boolean = false, staged: Boolean = false): Unit = {
    if (canonicalize) return appendCanonical(spark, batch, tablePath)
    val deduped = batch.dropDuplicates(pk)
    val incoming = withBlockRange(deduped)
    if (!staged) {
      val exists = hasCommittedData(spark, tablePath)
      // never CREATE the table from an empty batch: a parquet dir with
      // only _SUCCESS has no footer to infer a schema from and poisons
      // every later read (first live window with zero logs). Appending
      // an empty `fresh` to an existing table is harmless.
      if (!exists && incoming.isEmpty) return
      val fresh =
        if (exists) {
          val ranges = incoming.select("block_range").distinct()
            .collect().map(_.getLong(0))
          val existing = spark.read.parquet(tablePath)
            .filter(col("block_range").isin(ranges.toIndexedSeq: _*))
            .select(pk.map(col): _*)
          incoming.join(existing, pk, "left_anti")
        } else incoming
      bloomWriter(fresh
        .repartition(col("block_range"))
        .sortWithinPartitions("address", "topic0"))
        .partitionBy("block_range")
        .mode("append").parquet(tablePath)
      return
    }

    // Staged (concurrent-writer) form, serialized per partition
    // against in-place rewrites (r11): the anti-join read, the staged
    // write and the publish renames all run under the SAME per-range
    // lock `Logs.compact`/canonicalization swap under — closing two
    // real race windows the SnapshotsSpec stress tests sat on top of:
    // (1) a publish rename re-creating a partition dir the swap just
    // parked (both swap renames then fail), and (2) a staged file
    // landing between the rewrite's read and its park, getting parked
    // with the originals and silently vanishing from the live table.
    // Appends hold the lock for seconds (batch-sized work), so
    // rewriters WAIT for append holders rather than failing fast; an
    // appender waits for anyone (a partition rewrite is minutes at
    // worst, and its own data isn't visible until the renames anyway).
    // Lock order is ascending by range — multi-range appenders can
    // never deadlock each other.
    val ranges = incoming.select("block_range").distinct()
      .collect().map(_.getLong(0)).sorted
    // empty batch: nothing to stage (and never CREATE a table from one)
    if (ranges.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def underLocks[T](rs: Seq[Long])(body: => T): T =
      rs.foldRight(() => body) { (r, acc) => () =>
        withPartitionLock(fs, tablePath, r, kind = "append",
          waitFor = Set("append", "rewrite"), waitMs = 600000L)(acc())
      }.apply()
    underLocks(ranges.toIndexedSeq) {
      // partition-scoped anti-join: list ONLY the incoming ranges'
      // dirs (no full-table partition discovery — at 10^5 partitions
      // the root listing dwarfed the batch) and probe just their rows
      val existingDirs = ranges
        .map(r => new org.apache.hadoop.fs.Path(s"$tablePath/block_range=$r"))
        .filter(fs.exists).map(_.toString).toIndexedSeq
      val fresh =
        if (existingDirs.nonEmpty) {
          val existing = spark.read.option("basePath", tablePath)
            .parquet(existingDirs: _*)
            .select(pk.map(col): _*)
          incoming.join(existing, pk, "left_anti")
        } else incoming
      val writer = bloomWriter(fresh
        .repartition(col("block_range"))
        .sortWithinPartitions("address", "topic0"))
        .partitionBy("block_range")
      val stageId = java.util.UUID.randomUUID().toString
      val stageDir = new org.apache.hadoop.fs.Path(s"$tablePath/_graft_stage/$stageId")
      writer.mode("overwrite").parquet(stageDir.toString)
      try {
        fs.listStatus(stageDir).toSeq
          .filter(d => d.isDirectory && d.getPath.getName.startsWith("block_range="))
          .foreach { d =>
            val dest = new org.apache.hadoop.fs.Path(tablePath, d.getPath.getName)
            fs.mkdirs(dest)
            fs.listStatus(d.getPath).toSeq
              .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
              .foreach { f =>
                val to = new org.apache.hadoop.fs.Path(dest,
                  s"stage-$stageId-${f.getPath.getName}")
                if (!fs.rename(f.getPath, to))
                  throw new java.io.IOException(s"staged append: cannot publish $to")
              }
          }
      } finally {
        fs.delete(stageDir, true)
        // drop the _graft_stage root when this was the last stage in it
        val root = stageDir.getParent
        if (fs.exists(root) && fs.listStatus(root).isEmpty) fs.delete(root, false)
      }
    }
    // the anti-join above cached these partition dirs' listings; the
    // renames changed them behind the cache (the minhashWriteIndex
    // stale-FileStatusCache lesson) — refresh so same-session readers
    // and the NEXT batch's anti-join see the published files
    spark.catalog.refreshByPath(tablePath)
  }

  def tableExists(spark: SparkSession, tablePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** True once at least one data file is COMMITTED. A table dir that
    * exists but holds only `_temporary`/`_SUCCESS` (mid-first-write, or
    * after a crash before any job commit) has no parquet footer to
    * infer a schema from — reading it throws. Every read path below
    * treats that state as "empty table", so a status probe or resume
    * racing the first micro-batch sees 0 rows instead of an
    * AnalysisException (observed live: the StreamLogs stats loop
    * killed the stream mid-first-batch). */
  private def hasCommittedData(spark: SparkSession, tablePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val entries = fs.listStatus(p).toSeq
      entries.exists(e => e.isDirectory && e.getPath.getName.startsWith("block_range=")) ||
        entries.exists(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
    }
  }

  /** The table's `block_range=N` partition values, straight from the
    * directory listing (no Spark job, no footer reads). */
  private def listRanges(spark: SparkSession, tablePath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("block_range="))
      .map(_.stripPrefix("block_range=").toLong)
  }

  /** S4: resume point — `select max(block_number) from logs`
    * (`main.go:169`); 0 when the table is empty, matching
    * `getDatabaseBlockNumber`'s COALESCE-to-0 contract (`main.go:171`).
    *
    * Pruned to the lexically-max `block_range` partition: block_number
    * and block_range are monotone together, so the global max lives in
    * the max partition. One directory listing + one partition's footer
    * stats instead of O(#partitions) — on every resume of a table with
    * 10^5 ranges that's the difference between listing one directory
    * and all of them. */
  def highWaterMark(spark: SparkSession, tablePath: String): Long =
    if (!hasCommittedData(spark, tablePath)) 0L
    else {
      val ranges = listRanges(spark, tablePath)
      val scan =
        if (ranges.isEmpty) spark.read.parquet(tablePath) // unpartitioned layout
        else spark.read.parquet(s"$tablePath/block_range=${ranges.max}")
      scan.agg(coalesce(max("block_number"), lit(0L))).collect()(0).getLong(0)
    }

  /** Read the stored table in analytic column order (drops the
    * physical block_range partition column); empty before the first
    * commit lands. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    if (!hasCommittedData(spark, tablePath))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.parquet(tablePath).select(schema.fieldNames.map(col): _*)

  /** Compact the small files a micro-batch ingest accumulates: rewrite
    * the given block-range partitions (default: all) as a sorted,
    * size-targeted file set each, restoring the (address, topic0)
    * clustering that gives parquet min/max skipping its power. Run
    * periodically beside a streaming ingest; correctness is unaffected
    * (same rows, PK-deduped again in passing).
    *
    * Crash/read safety: each partition is compacted into a hidden
    * sibling directory (`.graft_compact_tmp`, invisible to partition
    * discovery) and swapped in with two renames, with the originals
    * parked in a backup dir until the swap lands — the input files are
    * never deleted before the replacement is fully written, so a
    * failure mid-compact leaves the partition either untouched or
    * fully replaced (the earlier cache()+overwrite scheme deleted the
    * partition before the write job committed). Restored on failure.
    *
    * Scale shape: partitions compact CONCURRENTLY (`parallelism` Spark
    * jobs at a time — at 100 TB a serial per-range loop is the
    * bottleneck, not the rewrites), and the output file count targets
    * `targetFileBytes` from the partition's actual on-disk size
    * instead of forcing one file per range (a hot range stays
    * parallel-readable). Single-writer vs concurrent INGEST still
    * assumed (a transactional table format is the upgrade path). */
  def compact(spark: SparkSession, tablePath: String,
      ranges: Option[Seq[Long]] = None,
      targetFileBytes: Long = 512L << 20,
      parallelism: Int = 4): Unit = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val targetRanges = ranges.getOrElse(listRanges(spark, tablePath))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, targetRanges.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    val jobs = targetRanges.map { r => Future {
      val partDir = new org.apache.hadoop.fs.Path(s"$tablePath/block_range=$r")
      val bytes = fs.getContentSummary(partDir).getLength
      val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      swapInPartition(fs, tablePath, r) { tmp =>
        bloomWriter(
          spark.read.parquet(partDir.toString) // partition-local read; no block_range col
            .dropDuplicates(pk)
            .repartition(nFiles)
            .sortWithinPartitions("address", "topic0"))
          .mode("overwrite").parquet(tmp)
      }
    }}
    // wait for EVERY job before any cleanup — a parked partition must
    // never be deleted while its swap is still in flight
    val results = jobs.map(f =>
      scala.util.Try(Await.result(f, scala.concurrent.duration.Duration.Inf)))
    pool.shutdown()
    if (results.forall(_.isSuccess)) {
      clearSwapDirs(fs, tablePath, targetRanges)
      recommitSnapshots(spark, tablePath)
    }
    // on failure: leave tmp/bak on disk — recovery evidence, and
    // possibly a parked partition whose restore itself failed
    results.collect { case scala.util.Failure(e) => throw e }
  }

  /** Re-pin snapshots after an in-place rewrite: compaction and
    * canonical swap-rewrites replace the very files older manifests
    * pin, so when the table is snapshot-tracked a fresh version is
    * published IN THE SAME OPERATION — the quiesce→rewrite→recommit
    * ordering is enforced by code, not by operators reading scaladoc.
    * Committed WITH retry: an appender publishing concurrently costs
    * the rewriter only a lost CAS (its retry re-lists the same
    * post-rewrite state), and an appender whose stale listing raced
    * this rewrite self-revokes via the publish liveness diff — either
    * way the surviving latest manifest reflects the rewrite. Readers
    * pinned to older versions still detect staleness via
    * [[Snapshots.isValid]]; new readers immediately get a valid pin. */
  private def recommitSnapshots(spark: SparkSession, tablePath: String): Unit =
    if (Snapshots.latestVersion(spark, tablePath).nonEmpty)
      Snapshots.commitWithRetry(spark, tablePath)

  /** Per-partition rewrite mutual exclusion — the rewrite-vs-rewrite
    * writer gap (two compactors, two canonicalizers, or one of each,
    * racing the SAME partition could interleave park/swap renames and
    * double data; the reference gets this for free from Postgres MVCC
    * + the PK, `schema.sql:51`). A lock file per block range is
    * claimed with an atomic no-overwrite create before any swap work
    * and released after the swap lands, so same-partition rewrites
    * serialize: the loser fails loudly with a retryable conflict
    * instead of corrupting the partition. DISJOINT ranges never
    * contend — compaction and canonicalization of different block
    * windows run concurrently by construction (each swap touches only
    * its own `block_range=N` live/tmp/bak/lock paths).
    *
    * The protocol lives in [[graft.util.DirLock]] (extracted r13 so
    * the signature-index writers and compactor share it); this is the
    * table-partition instantiation, one lock per `block_range`.
    *
    * Crash recovery: a rewriter that dies mid-swap leaves its lock;
    * locks older than `DirLock.StaleMs` (1 h — far beyond any
    * single-partition rewrite) are broken and re-claimed. The break
    * protocol: re-judge staleness IMMEDIATELY before acting (a breaker
    * that lost the race sees the winner's fresh re-claimed lock and
    * backs off without touching it — r7's delete-then-recreate judged
    * once and could delete that fresh lock, letting two rewriters
    * proceed), then rename the lock to a breaker-unique tombstone
    * (two breakers cannot both rename one instance away; rename
    * preserves mtime) and re-check the tombstone — a fresh lock
    * caught by a full owner cycle inside the microsecond re-judge→
    * rename window is renamed straight back. A waiter whose re-judge
    * finds the lock VANISHED never acquires in place (r9): that
    * reading is ambiguous between "owner released" and "a winning
    * breaker is inside its rename→re-claim gap", and acquiring on the
    * second meaning put two rewriters in one partition (observed as
    * colliding FileOutputCommitter _temporary dirs under suite load)
    * — it throws the retryable conflict instead, and the retry's
    * entry acquire is the one legitimate taker of a released lock.
    * Release deletes only a lock whose nonce this writer wrote — a
    * broken-and-reclaimed lock is never deleted out from under its
    * new owner. The rename-back residue makes this
    * serializing-best-effort, not a proof-grade mutex; on object
    * stores without atomic create-no-overwrite and mtime-preserving
    * rename it degrades the same way as every file-level CAS in this
    * layer (documented at [[graft.sources.Snapshots.publish]]). */
  private[sources] def withPartitionLock[T](fs: org.apache.hadoop.fs.FileSystem,
      tablePath: String, r: Long,
      kind: String = "rewrite",
      waitFor: Set[String] = Set("append"),
      waitMs: Long = 120000L)(body: => T): T =
    graft.util.DirLock.withLock(fs,
      new org.apache.hadoop.fs.Path(s"$tablePath/.graft_rewrite_lock"),
      s"block_range=$r", kind = kind, waitFor = waitFor, waitMs = waitMs)(body)

  /** Crash-safe partition rewrite: `write` lands the replacement in a
    * hidden tmp dir (invisible to partition discovery), the originals
    * are parked, and two renames swap the replacement in — the live
    * partition is either untouched or fully replaced at every instant,
    * and `write` may freely READ the live partition it replaces.
    * Guarded by [[withPartitionLock]]: same-partition rewrites
    * serialize, disjoint-partition rewrites don't contend. */
  private def swapInPartition(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      r: Long)(write: String => Unit): Unit = withPartitionLock(fs, tablePath, r) {
    val partDir = new org.apache.hadoop.fs.Path(s"$tablePath/block_range=$r")
    val tmp = new org.apache.hadoop.fs.Path(s"$tablePath/.graft_compact_tmp/block_range=$r")
    val bak = new org.apache.hadoop.fs.Path(s"$tablePath/.graft_compact_bak/block_range=$r")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(bak, true)
    fs.mkdirs(bak.getParent)
    if (!fs.rename(partDir, bak))
      throw new java.io.IOException(s"partition swap: cannot park $partDir")
    if (!fs.rename(tmp, partDir)) {
      if (!fs.rename(bak, partDir)) // restore, nothing lost
        throw new java.io.IOException(
          s"partition swap AND restore failed for $partDir — originals parked at $bak")
      throw new java.io.IOException(s"partition swap failed for $partDir, originals restored")
    }
    retainOrDelete(fs, tablePath, r, bak)
  }

  /** MVCC retention: on a snapshot-tracked table, files a swap
    * replaced move to `_graft_retained/block_range=N/` instead of
    * being deleted — manifests pinned BEFORE the rewrite keep
    * resolving every file they reference ([[Snapshots.read]] falls
    * back to the retained area), so compaction/canonicalization no
    * longer invalidates pinned readers at all. [[Snapshots.vacuum]]
    * is the GC: it deletes retained files once no kept manifest
    * references them. Untracked tables keep the plain delete. */
  private def retainOrDelete(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      r: Long, bak: org.apache.hadoop.fs.Path): Unit = {
    val tracked = fs.exists(new org.apache.hadoop.fs.Path(s"$tablePath/_graft_manifest"))
    if (tracked) {
      val dest = new org.apache.hadoop.fs.Path(s"$tablePath/_graft_retained/block_range=$r")
      fs.mkdirs(dest)
      fs.listStatus(bak).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          val d = new org.apache.hadoop.fs.Path(dest, st.getPath.getName)
          if (!fs.rename(st.getPath, d))
            throw new java.io.IOException(s"retention: cannot park ${st.getPath} at $d")
        }
    }
    fs.delete(bak, true)
  }

  /** Post-rewrite cleanup, scoped to the ranges THIS rewrite touched:
    * deleting the whole swap tree recursively would race a concurrent
    * rewrite of a DIFFERENT partition (its in-flight tmp lives under
    * the same hidden parent), which the per-partition locks
    * deliberately allow. The parents are then removed NON-recursively
    * — that delete refuses a non-empty dir, so a concurrent rewrite's
    * in-flight tmp survives; if it races the other way (parent
    * deleted just before the concurrent writer's first file), the
    * writer's own mkdirs recreates it. */
  private def clearSwapDirs(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      ranges: Iterable[Long]): Unit = {
    ranges.foreach { r =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$tablePath/.graft_compact_tmp/block_range=$r"), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$tablePath/.graft_compact_bak/block_range=$r"), true)
    }
    Seq(".graft_compact_tmp", ".graft_compact_bak").foreach { d =>
      try fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$d"), false)
      catch { case _: java.io.IOException => () } // non-empty: a concurrent rewrite owns it
    }
  }

  /** T4: canonical (reorg-resolved) view — latest write per PK wins,
    * `removed=true` tombstones drop out. The window shuffles only on
    * the PK hash; at scale this runs per block-range partition.
    *
    * Note: a tombstone that reuses an already-stored PK is dropped by
    * [[appendIdempotent]]'s DO-NOTHING before it ever reaches the
    * table — the same blind spot the reference acknowledges
    * (`get_logs.go:107` todo). Real reorgs replace the block hash, so
    * the replacement rows land as new PKs and this view resolves them;
    * to honor same-PK tombstones, feed the raw batch through
    * [[canonical]] (union of stored + batch) before writing. */
  def canonical(logs: DataFrame): DataFrame =
    latestPerPk(logs).filter(!col("removed"))

  /** One row per PK, tombstone-first: a removed=true version shadows
    * the original insert for the same PK (the winning tombstone row is
    * KEPT — callers that want it gone filter `removed`). */
  private def latestPerPk(logs: DataFrame): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col("removed").desc)
    logs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Same-PK tombstone write path — closes the DO-NOTHING blind spot
    * the reference leaves as a todo (`get_logs.go:107`): a
    * `removed=true` row that REUSES a stored PK is dropped by
    * [[appendIdempotent]]'s anti-join, so the tombstone never lands.
    * Here the touched partitions are unioned with the batch, ONE
    * version per PK survives with tombstones winning, and the
    * partitions are swap-rewritten in place.
    *
    * The winning tombstone row is stored, not deleted: it keeps
    * shadowing later at-least-once replays of the original insert
    * (no resurrection), and [[canonical]] drops it at read time.
    * Cost is O(touched partitions) — stored ranges the batch does not
    * overlap are never read or rewritten — so a micro-batch pays for
    * its own block window, not the table. */
  def appendCanonical(spark: SparkSession, batch: DataFrame, tablePath: String): Unit = {
    val incoming = withBlockRange(latestPerPk(batch))
    def writeFresh(rows: DataFrame): Unit = bloomWriter(rows
        .repartition(col("block_range"))
        .sortWithinPartitions("address", "topic0"))
      .mode("append").partitionBy("block_range").parquet(tablePath)
    if (!hasCommittedData(spark, tablePath)) {
      if (!incoming.isEmpty) writeFresh(incoming)
      return
    }
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stored = listRanges(spark, tablePath).toSet
    val touched = incoming.select("block_range").distinct().collect()
      .map(_.getAs[Number](0).longValue())
    val (overlapping, fresh) = touched.partition(stored)
    if (fresh.nonEmpty)
      writeFresh(incoming.filter(col("block_range").isin(fresh.toIndexedSeq: _*)))
    overlapping.foreach { r =>
      val partDir = new org.apache.hadoop.fs.Path(s"$tablePath/block_range=$r")
      val nFiles = math.max(1L,
        (fs.getContentSummary(partDir).getLength + (512L << 20) - 1) / (512L << 20)).toInt
      val merged = latestPerPk(
        spark.read.parquet(partDir.toString)
          .unionByName(incoming.filter(col("block_range") === r).drop("block_range")))
      swapInPartition(fs, tablePath, r) { tmp =>
        bloomWriter(merged.repartition(nFiles)
            .sortWithinPartitions("address", "topic0"))
          .mode("overwrite").parquet(tmp)
      }
    }
    clearSwapDirs(fs, tablePath, overlapping)
    if (overlapping.nonEmpty) recommitSnapshots(spark, tablePath)
  }
}
