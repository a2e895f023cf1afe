package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bloom seen-set: no false negatives ever, a sane false-positive
  * rate at the configured sizing, lossless batch unioning through
  * the persisted index, and the parameter-compat refusal. */
class BloomSeenSpec extends SparkSpec {
  import spark.implicits._

  test("bloomParams: m is a multiple of 32, k at least 1, sane magnitudes") {
    val (m, k) = Dedup.bloomParams(1000, 0.01)
    assert(m % 32 === 0L)
    assert(m > 1000L * 9 && m < 1000L * 11) // ~9.6 bits/key at 1%
    assert(k >= 6 && k <= 8)
    val (_, k1) = Dedup.bloomParams(1000000, 0.5)
    assert(k1 >= 1)
  }

  test("no false negatives; false-positive rate near the configured 1%") {
    val inserted = (0 until 500).map(i => s"key-$i").toDF("k")
    val fresh = (10000 until 14000).map(i => s"key-$i").toDF("k")
    val (m, kk) = Dedup.bloomParams(500, 0.01)
    val filter = Dedup.bloomBuild(inserted, "k", m, kk)
    val seenIn = Dedup.bloomProbe(inserted, "k", filter, m, kk)
      .filter(!col("maybe_seen")).count()
    assert(seenIn === 0L, "a Bloom filter must never forget an inserted key")
    val fp = Dedup.bloomProbe(fresh, "k", filter, m, kk)
      .filter(col("maybe_seen")).count()
    assert(fp < 4000 * 0.05, s"false-positive rate too high: $fp/4000")
  }

  test("persisted index unions batches losslessly and refuses mismatched params") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString + "/idx"
    val a = (0 until 100).map(i => s"a-$i").toDF("k")
    val b = (0 until 100).map(i => s"b-$i").toDF("k")
    Dedup.bloomWriteIndex(a, "k", dir, mBits = 8192L, k = 5)
    Dedup.bloomWriteIndex(b, "k", dir, mBits = 8192L, k = 5) // union in place
    val probed = Dedup.bloomProbeIndex(a.unionByName(b), "k", dir)
    assert(probed.filter(!col("maybe_seen")).count() === 0L)
    // a later batch with different params must refuse, not corrupt
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomWriteIndex(b, "k", dir, mBits = 4096L, k = 5)
    }
    assert(e.getMessage.contains("incompatible"))
    // the index survives the refused write untouched
    assert(Dedup.bloomProbeIndex(a, "k", dir)
      .filter(!col("maybe_seen")).count() === 0L)
  }

  test("a probe against an empty filter sees nothing") {
    val keys = Seq("x", "y").toDF("k")
    val empty = Dedup.bloomBuild(keys.filter(lit(false)), "k", 1024L, 4)
    val out = Dedup.bloomProbe(keys, "k", empty, 1024L, 4)
    assert(out.filter(col("maybe_seen")).count() === 0L)
  }

  test("null keys probe to null, not false (no-claim contract)") {
    val keys = Seq(Some("x"), None).toDF("k")
    val filter = Dedup.bloomBuild(Seq("x").toDF("k"), "k", 1024L, 4)
    val rows = Dedup.bloomProbe(keys, "k", filter, 1024L, 4).collect()
    assert(rows.filter(!_.isNullAt(0)).forall(_.getBoolean(1) === true))
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length === 1 && nullRow(0).isNullAt(1))
  }

  test("word-bucketed index: word_range partitions prune at planning; join probe agrees") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString + "/idx"
    val keys = (0 until 2000).map(i => s"key-$i").toDF("k")
    // 8192 bits = 256 words; 8 ranges of 32 words each
    Dedup.bloomWriteIndex(keys, "k", dir, mBits = 8192L, k = 5, wordRanges = 8)
    val parts = new java.io.File(dir).list().filter(_.startsWith("word_range=")).sorted
    assert(parts.length === 8, parts.mkString(","))
    val idx = spark.read.parquet(dir)
    val narrowed = idx.filter(col("word_range") === 3)
    val plan = narrowed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("word_range"),
      plan.take(1500))
    assert(narrowed.select(min(col("word")), max(col("word"))).collect()(0)
      .toSeq.asInstanceOf[Seq[Long]].forall(w => w >= 96L && w < 128L))
    // the non-broadcast (word-keyed join) probe serves identical
    // verdicts to the broadcast probe over the same index
    val probeSet = ((0 until 100) ++ (5000 until 5100)).map(i => s"key-$i").toDF("k")
    val joined = Dedup.bloomProbeIndex(probeSet, "k", dir, broadcastFilter = false)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val bcast = Dedup.bloomProbeIndex(probeSet, "k", dir, broadcastFilter = true)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(joined === bcast)
    assert((0 until 100).forall(i => joined(s"key-$i")), "false negative in join probe")
  }
}
