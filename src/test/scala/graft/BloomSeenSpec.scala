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
}
