package graft

import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.{MediaFile, MiniEncoder}
import org.apache.spark.sql.functions._

/** Incremental media dedup lifecycle (r12): persisted hamming
  * signature indexes with the minhashWriteIndex discipline — family
  * marker, param-compat refusal, append accumulation, refreshByPath —
  * and the batch-touching-pairs contract: probing a batch against
  * the index yields exactly the full-corpus kernel's pairs restricted
  * to those touching the batch, for all three media modalities. */
class IncrementalHammingSpec extends SparkSpec {
  import spark.implicits._

  private def imageDs(ids: Seq[Long]) =
    ids.map { id =>
      // hash-correlated gradient family (the q112 fixture shape):
      // many near pairs, deterministic
      val w = (id % 16 + 1).toInt * 2
      val h = (id % 12 + 1).toInt * 2
      MediaFile(id, "image", MiniEncoder.pngGray(w, h, (x, y) => ((x + y + id) % 256).toInt))
    }.toDS()

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Number](0).longValue,
      r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)).toSet

  test("image: incremental probe = full kernel restricted to batch-touching pairs") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/img"
    val ids = 1L to 40L
    val old = imageDs(ids.filter(_ % 2 == 0))
    val batch = imageDs(ids.filter(_ % 2 == 1))
    Multimodal.imageHashIndexWrite(old, dir)
    val inc = pairsOf(Multimodal.incrementalImageNearDuplicates(
      batch, dir, maxDistance = 4, maxBucket = 100))
    val full = pairsOf(Multimodal.imageNearDuplicates(
        imageDs(ids), maxDistance = 4, maxBucket = 100))
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(inc === full)
    assert(inc.nonEmpty, "fixture must actually produce near pairs")
    // no old-old pair leaked
    assert(inc.forall(p => p._1 % 2 == 1 || p._2 % 2 == 1))
  }

  test("append accumulates: batch 2 pairs against batch 1 through the index") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/img"
    // ids ≡ 10 (mod 48) share dims and a wrap-free monotone gradient
    // → identical all-ones dHash → distance 0
    val b1 = imageDs(Seq(10L))
    val b2 = imageDs(Seq(58L))
    Multimodal.imageHashIndexWrite(b1, dir)
    Multimodal.imageHashIndexWrite(b2, dir, mode = "append")
    // a third batch with another echo of the same raster pairs with BOTH
    val b3 = imageDs(Seq(106L))
    val got = pairsOf(Multimodal.incrementalImageNearDuplicates(
      b3, dir, maxDistance = 0, maxBucket = 100))
    assert(got === Set((10L, 106L, 0L), (58L, 106L, 0L)))
  }

  test("family and width mismatches refuse loudly; missing marker refuses") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/img"
    Multimodal.imageHashIndexWrite(imageDs(Seq(1L, 2L)), dir)
    val audio = Multimodal.syntheticWavMedia(Seq(3L).toDF("doc_id"))
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.incrementalAudioNearDuplicates(audio, dir).collect()
    }
    assert(e1.getMessage.contains("families are not interchangeable"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalHammingCandidates(spark, Seq((9L, 5L)).toDF("id", "sh"),
        dir, Multimodal.ImageHashFamily, 32, 2, 8, 100).collect()
    }
    assert(e2.getMessage.contains("width"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Multimodal.imageHashIndexWrite(imageDs(Seq(5L)),
        java.nio.file.Files.createTempDirectory("hidx").toString + "/none",
        mode = "append")
    }
    assert(e3.getMessage.contains("family marker") || e3.getMessage.contains("append"),
      e3.getMessage)
  }

  test("compactIndex: many appended file sets collapse, probes and marker survive") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/img"
    // five appended batches → at least five file sets
    Multimodal.imageHashIndexWrite(imageDs(Seq(1L, 2L)), dir)
    for (b <- 1 to 4)
      Multimodal.imageHashIndexWrite(imageDs(Seq(b * 10L, b * 10L + 1L)), dir,
        mode = "append")
    val probe = imageDs(Seq(201L, 202L))
    val beforePairs = pairsOf(Multimodal.incrementalImageNearDuplicates(
      probe, dir, maxDistance = 4, maxBucket = 100))
    val (nBefore, nAfter) = Dedup.compactIndex(spark, dir, targetFiles = 2)
    assert(nBefore >= 5 && nAfter <= 2, s"$nBefore -> $nAfter")
    // identical verdicts through the compacted index
    val afterPairs = pairsOf(Multimodal.incrementalImageNearDuplicates(
      probe, dir, maxDistance = 4, maxBucket = 100))
    assert(afterPairs === beforePairs && afterPairs.nonEmpty)
    // the family marker survived byte-identically: a cross-family
    // probe still refuses
    val audio = Multimodal.syntheticWavMedia(Seq(3L).toDF("doc_id"))
    val e = intercept[IllegalArgumentException] {
      Multimodal.incrementalAudioNearDuplicates(audio, dir).collect()
    }
    assert(e.getMessage.contains("families are not interchangeable"))
  }

  test("audio: incremental probe matches the full kernel's batch-touching pairs") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/aud"
    val docs = (1L to 30L).toDF("doc_id")
    val media = Multimodal.syntheticWavMedia(docs)
    val old = media.filter(col("doc_id") % 2 === 0)
    val batch = media.filter(col("doc_id") % 2 === 1)
    Multimodal.audioHashIndexWrite(old, dir)
    val inc = pairsOf(Multimodal.incrementalAudioNearDuplicates(
      batch, dir, maxDistance = 8, maxBucket = 100))
    val full = pairsOf(Multimodal.audioNearDuplicates(
        media, maxDistance = 8, maxBucket = 100))
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(inc === full)
  }

  test("video: frame-keyed incremental probe reproduces videoNearDuplicates semantics") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString + "/vid"
    // copy pair across the index/batch boundary: id 2 (index) and
    // id 1 (batch) share every frame; id 7 is unrelated
    def gif(id: Long, seed: Int) = MediaFile(id, "video",
      MiniEncoder.gifAnimGray(10, 9, 4, (x, y, f) => (x * 7 + y * 11 + f * 29 + seed) % 256))
    val old = Seq(gif(2L, 0), gif(4L, 77)).toDS()
    val batch = Seq(gif(1L, 0), gif(7L, 140)).toDS()
    Multimodal.videoHashIndexWrite(old, dir)
    val got = Multimodal.incrementalVideoNearDuplicates(
        batch, dir, maxDistance = 0, minMatched = 4, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 4L)))
  }
}
