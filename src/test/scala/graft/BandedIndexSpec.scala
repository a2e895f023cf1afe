package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Banded signature-index layouts (r13, the r12 verdict's #4): the
  * bloom `word_range` partition-pruning move extended to the
  * minhash / hamming / embedding-LSH indexes. Rows are stored
  * PRE-BANDED under a `pblock` partition column, so an incremental
  * probe reads only the blocks its batch touches — O(touched-buckets)
  * per trigger instead of re-banding the whole index. Contracts:
  * probes byte-identical through banded and flat layouts, the pruning
  * is REAL (scan-metric-counted), geometry/layout mismatches refuse
  * loudly, appends accumulate, and compaction carries the layout. */
class BandedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // planted hamming fixture: index ids 1..40 with SPREAD signatures
  // (golden-ratio multiply — unrelated ids differ in ~32 bits, so the
  // only pairs within distance 2 are the planted partners), batch
  // partners 101..140 at distance 1 (sh differs in bit 0)
  private def spread(i: Long): Long = i * 0x9E3779B97F4A7C15L
  private def idxSigs = (1L to 40L).map(i => (i, spread(i))).toDF("id", "sh")
  private def batchSigs = (1L to 40L).filter(_ % 3 == 0)
    .map(i => (100L + i, spread(i) ^ 1L)).toDF("id", "sh")

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("hamming: banded probe equals flat probe; the partition pruning is real") {
    val flat = tmp("bflat") + "/idx"
    val banded = tmp("bband") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, flat, "test-v1", 64)
    Dedup.hammingWriteIndex(idxSigs, banded, "test-v1", 64, bands = 8, ranges = 16)
    val pf = Dedup.incrementalHammingCandidates(spark, batchSigs, flat,
      "test-v1", 64, maxDistance = 2, bands = 8, maxBucket = 100)
    val pb = Dedup.incrementalHammingCandidates(spark, batchSigs, banded,
      "test-v1", 64, maxDistance = 2, bands = 8, maxBucket = 100)
    val expected = (1L to 40L).filter(_ % 3 == 0).map(i => (i, 100L + i, 1)).toSet
    assert(pairsOf(pf) === expected)
    assert(pairsOf(pb) === expected)
    // pruning happens AT PLANNING: the probe's index scans select
    // fewer partition files than the index holds (sparkPlan — the
    // pre-AQE physical plan — exposes the selected partitions the
    // listing produced under the pblock PartitionFilters)
    val scans = pb.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains(banded.replace("/idx", ""))) => f
    }
    assert(scans.nonEmpty, "probe plan must scan the banded index")
    val readFiles = scans.map(_.selectedPartitions.totalNumberOfFiles).max
    def parquetCount(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(parquetCount).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val allFiles = parquetCount(new java.io.File(banded))
    assert(readFiles < allFiles,
      s"probe must prune: read $readFiles of $allFiles parquet files")
    assert(scans.exists(_.toString.contains("pblock")),
      "pblock must appear in the probe scan's partition filters")
  }

  test("hamming: banded appends accumulate; layout and geometry mismatches refuse loudly") {
    val dir = tmp("bapp") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, dir, "test-v1", 64, bands = 8, ranges = 16)
    // a flat append into a banded index must refuse
    val eLayout = intercept[IllegalArgumentException] {
      Dedup.hammingWriteIndex(Seq((200L, 5L)).toDF("id", "sh"), dir,
        "test-v1", 64, mode = "append")
    }
    assert(eLayout.getMessage.contains("layouts are baked"))
    // a probe with different banding geometry must refuse
    val eGeom = intercept[IllegalArgumentException] {
      Dedup.incrementalHammingCandidates(spark, batchSigs, dir,
        "test-v1", 64, maxDistance = 2, bands = 4, maxBucket = 100).collect()
    }
    assert(eGeom.getMessage.contains("banding geometry is baked"))
    // a matching banded append lands and probes see it
    Dedup.hammingWriteIndex(Seq((50L, spread(77L))).toDF("id", "sh"), dir,
      "test-v1", 64, mode = "append", bands = 8, ranges = 16)
    val p = Dedup.incrementalHammingCandidates(spark,
      Seq((150L, spread(77L) ^ 2L)).toDF("id", "sh"), dir,
      "test-v1", 64, maxDistance = 2, bands = 8, maxBucket = 100)
    assert(pairsOf(p) === Set((50L, 150L, 1)))
    // the flat view serves one row per id from the band-0 slice
    val ids = Dedup.hammingIndexFlat(spark, dir).select("id").as[Long].collect()
    assert(ids.length === ids.distinct.length)
    assert(ids.toSet === (1L to 40L).toSet + 50L)
  }

  test("hamming: compactIndex preserves the banded layout and probe results") {
    val dir = tmp("bcomp") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, dir, "test-v1", 64, bands = 8, ranges = 16)
    for (b <- 1 to 3)
      Dedup.hammingWriteIndex(Seq((60L + b, (200L + b) * 4096L)).toDF("id", "sh"),
        dir, "test-v1", 64, mode = "append", bands = 8, ranges = 16)
    val before = pairsOf(Dedup.incrementalHammingCandidates(spark, batchSigs, dir,
      "test-v1", 64, maxDistance = 2, bands = 8, maxBucket = 100))
    val (nb, na) = Dedup.compactIndex(spark, dir, targetFiles = 8)
    assert(nb > na, s"$nb -> $na")
    val sub = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pblock=")).length
    assert(sub > 0, "pblock partition dirs must survive compaction")
    val after = pairsOf(Dedup.incrementalHammingCandidates(spark, batchSigs, dir,
      "test-v1", 64, maxDistance = 2, bands = 8, maxBucket = 100))
    assert(after === before)
  }

  test("embedding-LSH: banded probe equals flat probe") {
    // random ±1 vectors in 32 dims (the spread bits): unrelated pairs
    // sit well under the threshold, planted near-copies at ~1.0
    def vec(i: Long): Seq[Double] =
      (0 until 32).map(d => if (((spread(i) >> d) & 1L) == 1L) 1.0 else -1.0)
    val base = (1L to 30L).map(i => (i, vec(i))).toDF("id", "v")
    val batch = (1L to 30L).filter(_ % 5 == 0)
      .map(i => (100L + i, vec(i).map(_ * 1.0000001))).toDF("id", "v")
    val flat = tmp("cflat") + "/idx"
    val banded = tmp("cband") + "/idx"
    Similarity.cosineWriteIndex(base, "id", "v", flat, dim = 32, bits = 16)
    Similarity.cosineWriteIndex(base, "id", "v", banded, dim = 32, bits = 16,
      bands = 4, ranges = 8)
    def run(path: String) = Similarity.incrementalCosineNearDuplicates(
        spark, batch, "id", "v", path, base, minCosine = 0.95,
        dim = 32, bits = 16, bands = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1L to 30L).filter(_ % 5 == 0).map(i => (i, 100L + i)).toSet
    assert(run(flat) === expected)
    assert(run(banded) === expected)
  }

  test("minhash: banded probe equals flat probe; estimate rides the band-0 sig slice") {
    val mk = (i: Long, tail: String) =>
      (i, s"the quick brown fox jumps over the lazy dog number $tail")
    val corpus = (1L to 12L).map(i => mk(i, s"unique$i extra words here")).toDF("doc_id", "text")
    // batch: exact copies of docs 2 and 7, one fresh doc
    val batch = Seq(mk(102L, "unique2 extra words here"),
      mk(107L, "unique7 extra words here"),
      mk(110L, "completely novel content about engines")).toDF("doc_id", "text")
    val flat = tmp("mflat") + "/idx"
    val banded = tmp("mband") + "/idx"
    Dedup.minhashWriteIndex(corpus, "doc_id", "text", flat)
    Dedup.minhashWriteIndex(corpus, "doc_id", "text", banded,
      bands = 16, ranges = 8)
    def run(path: String) = Dedup.incrementalNearDuplicates(spark, batch,
        "doc_id", "text", path, corpus, minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((2L, 102L), (7L, 107L))
    assert(run(flat) === expected)
    assert(run(banded) === expected)
    // banded minhash appends accumulate too
    Dedup.minhashWriteIndex(batch, "doc_id", "text", banded,
      mode = "append", bands = 16, ranges = 8)
    val p2 = Dedup.incrementalNearDuplicates(spark,
        Seq(mk(210L, "completely novel content about engines")).toDF("doc_id", "text"),
        "doc_id", "text", banded, corpus.unionByName(batch), minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === Set((110L, 210L)))
  }

  test("rebandIndex r14: geometry rewrites across all three kinds; probes identical; appends follow the new marker") {
    // hamming: banded(8,16) -> banded(4,8) -> flat, probes identical
    // through every geometry (presented bands follow the layout)
    val hDir = tmp("rbham") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, hDir, "test-v1", 64, bands = 8, ranges = 16)
    val expectedH = (1L to 40L).filter(_ % 3 == 0).map(i => (i, 100L + i, 1)).toSet
    def probeH(bands: Int) = pairsOf(Dedup.incrementalHammingCandidates(
      spark, batchSigs, hDir, "test-v1", 64, maxDistance = 2,
      bands = bands, maxBucket = 100))
    assert(probeH(8) === expectedH)
    val n1 = Dedup.rebandIndex(spark, hDir, bands = 4, ranges = 8)
    assert(n1 === 40L)
    assert(probeH(4) === expectedH)
    // the OLD geometry now refuses — geometry is marker-baked
    val eGeom = intercept[IllegalArgumentException](probeH(8))
    assert(eGeom.getMessage.contains("banding geometry"))
    // appends must present the new geometry
    val eApp = intercept[IllegalArgumentException](
      Dedup.hammingWriteIndex(Seq((60L, 4096L)).toDF("id", "sh"), hDir,
        "test-v1", 64, mode = "append", bands = 8, ranges = 16))
    assert(eApp.getMessage.contains("layout"))
    Dedup.hammingWriteIndex(Seq((60L, 4096L)).toDF("id", "sh"), hDir,
      "test-v1", 64, mode = "append", bands = 4, ranges = 8)
    assert(probeH(4) === expectedH) // the appended loner pairs with nothing
    // flatten: marker layout cleared, identity fields carried
    Dedup.rebandIndex(spark, hDir, bands = 0)
    assert(Dedup.hammingIndexFlat(spark, hDir).count() === 41L)
    assert(probeH(4) === expectedH)
    val eDiv = intercept[IllegalArgumentException](
      Dedup.rebandIndex(spark, hDir, bands = 7))
    assert(eDiv.getMessage.contains("must divide"))

    // minhash: flat -> banded(16,8), probe + flat view identical,
    // and the re-banded layout equals a fresh banded write
    val mk = (i: Long, tail: String) =>
      (i, s"the quick brown fox jumps over the lazy dog number $tail")
    val corpus = (1L to 12L).map(i => mk(i, s"unique$i extra words here")).toDF("doc_id", "text")
    val batch = Seq(mk(102L, "unique2 extra words here"),
      mk(107L, "unique7 extra words here")).toDF("doc_id", "text")
    val mDir = tmp("rbmin") + "/idx"
    val mFresh = tmp("rbminf") + "/idx"
    Dedup.minhashWriteIndex(corpus, "doc_id", "text", mDir)
    val flatSigs = Dedup.minhashIndexFlat(spark, mDir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    Dedup.rebandIndex(spark, mDir, bands = 16, ranges = 8)
    Dedup.minhashWriteIndex(corpus, "doc_id", "text", mFresh, bands = 16, ranges = 8)
    assert(Dedup.minhashIndexFlat(spark, mDir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap === flatSigs)
    def probeM(path: String) = Dedup.incrementalNearDuplicates(spark, batch,
        "doc_id", "text", path, corpus, minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeM(mDir) === Set((2L, 102L), (7L, 107L)))
    assert(probeM(mDir) === probeM(mFresh))

    // embedding-LSH: banded(4,8) -> banded(8,4), probe follows
    def vec(i: Long): Seq[Double] =
      (0 until 32).map(d => if (((spread(i) >> d) & 1L) == 1L) 1.0 else -1.0)
    val base = (1L to 30L).map(i => (i, vec(i))).toDF("id", "v")
    val ebatch = (1L to 30L).filter(_ % 5 == 0)
      .map(i => (100L + i, vec(i).map(_ * 1.0000001))).toDF("id", "v")
    val cDir = tmp("rbcos") + "/idx"
    Similarity.cosineWriteIndex(base, "id", "v", cDir, dim = 32, bits = 16,
      bands = 4, ranges = 8)
    Dedup.rebandIndex(spark, cDir, bands = 8, ranges = 4)
    val got = Similarity.incrementalCosineNearDuplicates(
        spark, ebatch, "id", "v", cDir, base, minCosine = 0.95,
        dim = 32, bits = 16, bands = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (1L to 30L).filter(_ % 5 == 0).map(i => (i, 100L + i)).toSet)
  }

  test("marker discipline r15: reordered fields reband correctly; unknown fields refuse loudly") {
    import graft.util.IndexMarker
    val dir = tmp("rbmark") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, dir, "test-v1", 64, bands = 8, ranges = 16)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def putMarker(txt: String): Unit = {
      val out = fs.create(IndexMarker.markerPath(dir), true)
      out.write(txt.getBytes("UTF-8")); out.close()
    }
    val expected = (1L to 40L).filter(_ % 3 == 0).map(i => (i, 100L + i, 1)).toSet
    def probe(bands: Int) = pairsOf(Dedup.incrementalHammingCandidates(
      spark, batchSigs, dir, "test-v1", 64, maxDistance = 2,
      bands = bands, maxBucket = 100))

    // a REORDERED marker (layout fields first, identity last — the
    // r14 regex strip assumed the writers' exact order and would have
    // carried stale geometry text into the identity prefix) rebands
    // correctly: identity fields survive verbatim, probes at the new
    // geometry succeed under the same family/width
    putMarker("""{"ranges":16,"layout":"banded","bands":8,"width":64,"family":"test-v1"}""")
    assert(Dedup.rebandIndex(spark, dir, bands = 4, ranges = 8) === 40L)
    val m = IndexMarker.read(fs, dir).get
    assert(m.str("family") === Some("test-v1"))
    assert(m.int("width") === Some(64))
    assert(m.layout === Some((4, 8)))
    assert(probe(4) === expected)

    // a marker carrying a field outside the known vocabulary was
    // written by a newer tool — every reader refuses rather than
    // silently rewriting around semantics it can't honor
    putMarker("""{"family":"test-v1","width":64,"salt":7}""")
    val eReband = intercept[IllegalArgumentException](
      Dedup.rebandIndex(spark, dir, bands = 8, ranges = 16))
    assert(eReband.getMessage.contains("unknown field 'salt'"))
    val eProbe = intercept[IllegalArgumentException](probe(4))
    assert(eProbe.getMessage.contains("unknown field 'salt'"))
    val eCompact = intercept[IllegalArgumentException](
      Dedup.compactIndex(spark, dir, targetFiles = 1))
    assert(eCompact.getMessage.contains("unknown field 'salt'"))

    // malformed markers (duplicate keys, nesting, trailing junk)
    // refuse with the offending text in the message
    for (bad <- Seq(
        """{"family":"test-v1","family":"other","width":64}""",
        """{"family":"test-v1","width":{"v":64}}""",
        """{"family":"test-v1","width":64} extra""")) {
      putMarker(bad)
      val e = intercept[IllegalArgumentException](probe(4))
      assert(e.getMessage.contains("malformed index marker"), bad)
    }

    // restore a good marker: parse -> render round-trips and serves
    putMarker("""{ "family" : "test-v1" , "width" : 64 }""")
    val roundTrip = IndexMarker.read(fs, dir).get
    assert(roundTrip.render === """{"family":"test-v1","width":64}""")
  }

  test("recommendGeometry r15: SCALE.md's rule applied to observed size; drift pinned to the measured crossover") {
    def parquetBytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(d))
    }
    def nextPow2(v: Long): Int = {
      var p = 1L; while (p < v) p <<= 1; p.toInt
    }
    // banded index: recommendation = ceil(bytes / (bands * target))
    // rounded up to a power of two; drift = blocks past 2x target
    val bDir = tmp("geob") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, bDir, "test-v1", 64, bands = 8, ranges = 16)
    val bBytes = parquetBytes(bDir)
    val tiny = Dedup.recommendGeometry(spark, bDir, targetBlockBytes = 64L)
    assert(tiny.bands === 8)
    assert(tiny.ranges === 16)
    assert(tiny.flatRows === 40L)
    assert(tiny.indexBytes === bBytes)
    assert(tiny.blockBytes === bBytes / (8L * 16L))
    assert(tiny.recommendedRanges ===
      nextPow2((bBytes + 8L * 64L - 1) / (8L * 64L)))
    assert(tiny.drifted, "KB-scale blocks must drift past a 64 B target")
    assert(tiny.hint(bDir).contains(s"RebandIndex $bDir 8 ${tiny.recommendedRanges}"))
    val roomy = Dedup.recommendGeometry(spark, bDir, targetBlockBytes = 1L << 30)
    assert(roomy.recommendedRanges === 1)
    assert(!roomy.drifted)
    // flat index: banded footprint estimated (flatBytes + bands*rows*16),
    // bands defaults to the probe default, ranges/blockBytes read 0,
    // drift is the MEASURED r14 flat/banded crossover — 1.5M sigs
    // drifted, 500k not (SCALE.md r14 table)
    val fDir = tmp("geof") + "/idx"
    Dedup.hammingWriteIndex(idxSigs, fDir, "test-v1", 64)
    val fBytes = parquetBytes(fDir)
    val flat = Dedup.recommendGeometry(spark, fDir, targetBlockBytes = 64L)
    assert(flat.bands === 16)
    assert(flat.ranges === 0)
    assert(flat.blockBytes === 0L)
    val est = fBytes + 16L * 40L * 16L
    assert(flat.recommendedRanges === nextPow2((est + 16L * 64L - 1) / (16L * 64L)))
    assert(!flat.drifted, "40 signatures sit far below the crossover")
    assert(Dedup.FlatCrossoverRows === 1000000L)
    assert(flat.copy(flatRows = 1500000L).drifted)   // the measured banded-wins row
    assert(!flat.copy(flatRows = 500000L).drifted)   // the measured flat-wins row
    // bands override respected; default target reads the session conf
    assert(Dedup.recommendGeometry(spark, fDir, bands = 4,
      targetBlockBytes = 64L).bands === 4)
    assert(Dedup.recommendGeometry(spark, bDir).targetBlockBytes ===
      spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .stripSuffix("b").toLong)
    // a marker-less dir refuses
    val e = intercept[IllegalArgumentException](
      Dedup.recommendGeometry(spark, tmp("geonone")))
    assert(e.getMessage.contains("no family marker"))
  }
}
