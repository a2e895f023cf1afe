package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Corpus, Dedup}
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CLI: scale rehearsal for the headline dedup stack (VERDICT r8 #7).
  * The 100 TB arguments for these operators are design-argued and
  * spec-asserted but were never MEASURED beyond sf0.1; this drives the
  * five most expensive operator paths — banded-LSH near-dup (q33's
  * shape), duplicate clustering (q57), incremental index dedup (q74),
  * exact-substring span removal (q85) and the leakage-safe split
  * (q89) — on the sf0.1 corpus and on a deterministically amplified
  * ~`factor`× copy, and reports wall-time ratios against the data
  * ratio. Near-linear ratios (ratio ≈ factor on a fixed-size local
  * cluster) are the pass signal; superlinear growth is a scale bug.
  *
  * Amplification (written once to a temp parquet, never to
  * /root/testdata): replica k of each doc offsets the id by
  * k·10^7 and, for k > 0, remaps the token vocabulary (`tok` →
  * `tok~k`), so replicas share NO shingles with the base or each
  * other. That replicates the base corpus's internal near-duplicate
  * structure exactly `factor` times — duplicate DENSITY stays
  * scale-invariant, which is the point: amplifying with UNSALTED text
  * would multiply every LSH bucket and cluster size by `factor`
  * (a density change that degrades any dedup algorithm superlinearly
  * by construction), measuring the wrong axis. The token remap is a
  * plain `concat` inside the `transform` lambda — cheap by the
  * staged-columns contract (`Dedup.shinglesFromTokens` scaladoc).
  *
  * Each path is evaluated through the noop sink (the bench lesson:
  * count() lets Catalyst prune the work under test), with one
  * discarded base-corpus warmup per path so the timed base run is not
  * paying first-plan JIT that the amplified run then skips.
  *
  * r11 adds the SHIP-IT chain the r10 verdict asked to measure
  * rather than argue: `tokenize_ship` = unigram Viterbi encode →
  * int32_le binarize → tar-shard export (the q99/q104 path, with a
  * fixed serving vocab as in production — training is a separate
  * artifact build, not part of every export), and `kn_score` =
  * bigram-model build on half the corpus + Kneser–Ney scoring of the
  * other half (the q98 path).
  *
  * Usage: runMain graft.tools.ScaleRehearsal [sfDir] [factor] [paths]
  * (`paths` = comma list to restrict, e.g. `tokenize_ship,kn_score`.)
  * Prints one JSON line; SCALE.md records the numbers.
  */
object ScaleRehearsal {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val base = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val ampPath = java.nio.file.Files.createTempDirectory("graft_amp").toString + "/docs"
    base
      .withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("doc_id") + col("k").cast(LongType) * 10000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), t => concat(t, lit("~"), col("k"))),
            " "))
          .as("text"))
      .write.mode("overwrite").parquet(ampPath)
    val amp = spark.read.parquet(ampPath)
    val nBase = base.count(); val nAmp = amp.count()

    def nearDupPairs(df: DataFrame): DataFrame =
      Dedup.nearDuplicates(df, "doc_id", "text",
        minJaccard = 0.6, numHashes = 32, bands = 16, shingleK = 2,
        minEstimate = 0.1, maxBucket = 1000)

    def clusters(df: DataFrame): DataFrame = {
      val cl = Dedup.duplicateClusters(nearDupPairs(df).select(col("id_a"), col("id_b")))
      df.select(col("doc_id").as("id"))
        .join(cl, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("cluster"))))
    }

    def incremental(df: DataFrame): Unit = {
      val work = java.nio.file.Files.createTempDirectory("graft_rehearsal").toString
      Dedup.minhashWriteIndex(df, "doc_id", "text", s"$work/sigidx",
        numHashes = 32, shingleK = 2)
      val newBatch = df.filter(col("doc_id") % 17 === 3)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" graftnew")).as("text"))
      noop(Dedup.incrementalNearDuplicates(spark, newBatch, "doc_id", "text",
        s"$work/sigidx", df.select(col("doc_id"), col("text")),
        minJaccard = 0.6, numHashes = 32, bands = 16, shingleK = 2,
        minEstimate = 0.1, maxBucket = 1000))
    }

    // r13: the probe-only pair isolating the banded layout's win.
    // The flat/banded `incremental_dedup` path above times index
    // write + probe together (the r6 continuity number); in
    // production the write amortizes over thousands of triggers, so
    // what the layout buys is the PER-TRIGGER probe — these two
    // paths pre-build the index (untimed, `prepare` below) and time
    // ONLY the probe. `_probe` = flat layout, `_banded_probe` = the
    // pblock-partitioned layout whose touched blocks prune at
    // planning.
    // The probe is a TRIGGER-SIZED batch (≈50 docs, FIXED — a
    // micro-batch does not grow with the corpus), so base-vs-amp
    // isolates how per-trigger cost scales with INDEX size: the flat
    // layout re-bands the whole index per probe (O(index)); the
    // banded layout reads only the batch's touched pblocks
    // (O(touched) — near-flat in index size).
    def buildMinhashIdx(df: DataFrame, banded: Boolean): String = {
      val work = java.nio.file.Files.createTempDirectory("graft_rehearsalb").toString
      Dedup.minhashWriteIndex(df, "doc_id", "text", s"$work/sigidx",
        numHashes = 32, shingleK = 2,
        bands = if (banded) 16 else 0, ranges = 256)
      s"$work/sigidx"
    }
    lazy val mhIdx: Map[(Boolean, Boolean), String] = Map(
      (false, false) -> buildMinhashIdx(base, banded = false),
      (false, true) -> buildMinhashIdx(amp, banded = false),
      (true, false) -> buildMinhashIdx(base, banded = true),
      (true, true) -> buildMinhashIdx(amp, banded = true))
    // parquet-backed, not pinned: the inter-measurement clean()
    // unpersists every block, which would kill a localCheckpoint
    lazy val probeBatch = {
      val p = java.nio.file.Files.createTempDirectory("graft_probe").toString + "/b"
      base.filter(col("doc_id") % 97 === 3)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" graftnew")).as("text"))
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    def incrementalProbeOnly(df: DataFrame, banded: Boolean): Unit = {
      val idx = mhIdx((banded, df eq amp))
      noop(Dedup.incrementalNearDuplicates(spark, probeBatch, "doc_id", "text",
        idx, df.select(col("doc_id"), col("text")),
        minJaccard = 0.6, numHashes = 32, bands = 16, shingleK = 2,
        minEstimate = 0.1, maxBucket = 1000))
    }

    def spanRemoval(df: DataFrame): Unit =
      noop(Dedup.removeDuplicatedSpans(
        df.filter(length(Text.normalized(col("text"))) > 0),
        "doc_id", "text", w = 3))

    def splitPath(df: DataFrame): Unit =
      noop(Corpus.assignSplits(
        df.select(col("doc_id").as("id"))
          .join(Dedup.duplicateClusters(
              nearDupPairs(df).select(col("id_a"), col("id_b"))),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster")),
        "cluster", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))))

    // fixed serving vocab (q104's shape): chars + a few multi-char
    // pieces; charFloor lets salted `tok~k` text encode too
    val shipVocab: Seq[(String, Double)] =
      (('a' to 'z') ++ ('0' to '9')).map(_.toString -> -1.0) ++
        Seq("the" -> -0.5, "ing" -> -0.7, "tion" -> -0.9, "and" -> -0.6)
    def tokenizeShip(df: DataFrame): Unit = {
      val out = java.nio.file.Files.createTempDirectory("graft_ship").toString + "/tar"
      val ids = graft.operators.Unigram.encodeDocsIds(
        df.select(col("doc_id"), col("text")), "text", shipVocab, charFloor = -1.0)
      graft.sinks.TarShards.write(
        ids.select(col("doc_id").cast("string").as("k"),
          graft.functions.Int32Le.int32le(col("token_ids")).as("p")),
        "k", "p", "bin", out, nShards = 16)
      ()
    }

    def knPath(df: DataFrame): Unit = {
      val model = Corpus.bigramModel(df.filter(col("doc_id") % 2 === 0), "text")
      noop(Corpus.knScore(df.filter(col("doc_id") % 2 === 1), "doc_id", "text", model))
    }

    // r11: the WARC interchange round trip (q107/q108's shape) —
    // export as member-per-record gzip shards + cdx, then a
    // header-only manifest scan back through the DSv2 source (the
    // cdx fast path, the pattern a 100 TB hand-off audit runs)
    def warcRoundtrip(df: DataFrame): Unit = {
      val out = java.nio.file.Files.createTempDirectory("graft_warc").toString + "/warc"
      graft.sinks.WarcShards.write(
        df.select(col("doc_id").cast("string").as("k"),
          concat(lit("urn:graft:doc/"), col("doc_id")).as("u"),
          col("text").cast("binary").as("p")),
        "k", "u", "p", out, nShards = 16)
      noop(spark.read.format("graft.sources.WarcSource").option("path", out).load()
        .select(col("shard"), col("record_id"), col("content_length")))
    }

    // r11: image dedup at media scale — synthesize one image per doc
    // (the q111/q112 device; amplified ids yield distinct rasters),
    // hash and pair through the shared hamming kernel
    def mediaDedup(df: DataFrame): Unit =
      noop(graft.operators.Multimodal.imageNearDuplicates(
        graft.operators.Multimodal.syntheticPixelMedia(df.select(col("doc_id"))),
        maxDistance = 2, maxBucket = 200))

    // r11: the seen-set round trip — build the Bloom bitmap over half
    // the corpus's fingerprints, probe the whole corpus (q116's shape)
    def bloomSeen(df: DataFrame): Unit = {
      val keys = df.select(col("doc_id"),
        Text.fingerprint(col("text")).as("fp"))
      val filter = Dedup.bloomBuild(
        keys.filter(col("doc_id") % 2 === 0), "fp", 1 << 20, 6)
      noop(Dedup.bloomProbe(keys, "fp", filter, 1 << 20, 6))
    }

    // r12: the seen-set at can't-broadcast scale — persisted
    // word-range-partitioned index probed through the word-keyed JOIN
    // path (broadcastFilter = false), the shape a 10^10-bit filter
    // (~12 GB of words, past any broadcast threshold) forces
    def bloomSeenJoin(df: DataFrame): Unit = {
      val idx = java.nio.file.Files.createTempDirectory("graft_bloomidx").toString + "/idx"
      val keys = df.select(col("doc_id"),
        Text.fingerprint(col("text")).as("fp"))
      Dedup.bloomWriteIndex(keys.filter(col("doc_id") % 2 === 0), "fp",
        idx, 1 << 20, 6)
      noop(Dedup.bloomProbeIndex(keys, "fp", idx, broadcastFilter = false))
    }

    // r12: incremental media dedup (q119's shape) — even ids are the
    // persisted dHash index, odd ids the arriving batch; pairs via
    // the batch-probing incremental kernel instead of full re-banding
    def incMediaDedup(df: DataFrame): Unit = {
      val idx = java.nio.file.Files.createTempDirectory("graft_hidx").toString + "/img"
      val media = graft.operators.Multimodal.syntheticPixelMedia(
        df.select(col("doc_id")))
      graft.operators.Multimodal.imageHashIndexWrite(
        media.filter(col("doc_id") % 2 === 0), idx)
      noop(graft.operators.Multimodal.incrementalImageNearDuplicates(
        media.filter(col("doc_id") % 2 === 1), idx,
        maxDistance = 2, maxBucket = 200))
    }

    // r13: the media probe-only pair (see the minhash pair's comment)
    def buildImageIdx(df: DataFrame, banded: Boolean): String = {
      val idx = java.nio.file.Files.createTempDirectory("graft_hidxb").toString + "/img"
      val media = graft.operators.Multimodal.syntheticPixelMedia(
        df.select(col("doc_id")))
      graft.operators.Multimodal.imageHashIndexWrite(media, idx,
        bands = if (banded) 8 else 0, ranges = 256)
      idx
    }
    lazy val imgIdx: Map[(Boolean, Boolean), String] = Map(
      (false, false) -> buildImageIdx(base, banded = false),
      (false, true) -> buildImageIdx(amp, banded = false),
      (true, false) -> buildImageIdx(base, banded = true),
      (true, true) -> buildImageIdx(amp, banded = true))
    def incMediaProbeOnly(df: DataFrame, banded: Boolean): Unit = {
      val idx = imgIdx((banded, df eq amp))
      // trigger-sized fixed batch, ids disjoint from any index
      val media = graft.operators.Multimodal.syntheticPixelMedia(
        base.filter(col("doc_id") % 97 === 3)
          .select((col("doc_id") + 200000000L).as("doc_id")))
      noop(graft.operators.Multimodal.incrementalImageNearDuplicates(
        media, idx, maxDistance = 2, maxBucket = 200))
    }

    // r12: sampled-threshold CCNet bucketing (q117's shape) — cut
    // points from a hash-sample, comparison buckets, ZERO window.
    // Group density is scale-invariant under amplification, so the
    // dominant-group-straggler axis (the reason the exact ntile form
    // is not the 100 TB path) is exactly what 10x exercises; the
    // score is a cheap deterministic hash so the measurement is the
    // bucketing, not a scorer
    def ccnetApprox(df: DataFrame): Unit = {
      val scored = df.select(col("doc_id").as("id"),
        pmod(col("doc_id"), lit(17L)).as("g"),
        (xxhash64(col("text")) % 1000000L).cast("double").as("s"))
      noop(Corpus.scoreBucketsApprox(scored, "id", "g", "s", k = 3,
        sampleFraction = 0.05))
    }

    // r12: incremental embedding dedup (q122's shape) at 10× — the
    // third incremental leg. Amplification must keep near-dup DENSITY
    // scale-invariant (the text-salting argument): replica k applies
    // a k-keyed ±1 sign flip per coordinate — an isometry, so every
    // within-replica cosine (and thus every replica's internal
    // near-dup structure) is EXACTLY preserved, while cross-replica
    // pairs decorrelate to near-orthogonal (dim 64 → |cos| ~ 1/8 rms,
    // far below any dedup threshold).
    lazy val baseEmb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    lazy val ampEmb: DataFrame = {
      val p = java.nio.file.Files.createTempDirectory("graft_amp_emb")
        .toString + "/emb"
      baseEmb.withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
        .select(
          (col("vec_id") + col("k").cast(LongType) * 10000000L).as("vec_id"),
          transform(col("v"), (x, i) =>
            x * when(pmod(xxhash64(col("k"), i), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0))).as("v"))
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // the framework hands this path the DOCUMENTS frame; it only
    // uses it to pick the matching embeddings side (reference
    // equality against `amp` — the frames travel unchanged)
    def incEmbDedup(df: DataFrame): Unit = {
      val emb = if (df eq amp) ampEmb else baseEmb
      val idx = java.nio.file.Files.createTempDirectory("graft_coslsh")
        .toString + "/idx"
      graft.operators.Similarity.cosineWriteIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "v", idx, dim = 64)
      noop(graft.operators.Similarity.incrementalCosineNearDuplicates(
        spark, emb.filter(col("vec_id") % 2 === 1), "vec_id", "v", idx,
        emb.filter(col("vec_id") % 2 === 0), minCosine = 0.9, dim = 64,
        bands = 8))
    }

    // r17: the web layer at 10× (the r16 verdict's #5) — pages
    // synthesized from the docs frame with the q152 chrome shape plus
    // three anchors each. Host ids are doc_id/50, so the HOST GRAPH
    // grows with the corpus (amplified id bands land in fresh host
    // ranges) while per-host density stays scale-invariant: 50 pages
    // per host, 3 links per page, bounded per-host frontier windows —
    // the same density-preserving discipline as the text salting.
    def webPages(df: DataFrame): DataFrame = {
      def hostOf(c: org.apache.spark.sql.Column) =
        concat(lit("h"), floor(c / 50L).cast(LongType).cast("string"),
          lit(".example"))
      val id = col("doc_id").cast("string")
      val page = concat(
        lit("<html><body><div class=\"nav\"><a href=\"/nav\">Home</a> " +
          "<a href=\"/about\">About</a></div><h1>Doc "), id,
        lit("</h1><p>"), col("text"),
        lit("</p><ul><li><a href=\"http://"), hostOf(col("doc_id") * 31L + 7L),
        lit("/p"), id,
        lit("\">first</a></li><li><a href=\"http://"),
        hostOf(col("doc_id") * 17L + 3L), lit("/q"), id,
        lit("\">second</a></li><li><a href=\"../rel/"), id,
        lit("\">third</a></li></ul><div>copyright</div></body></html>"))
      df.select(
        concat(lit("http://"), hostOf(col("doc_id")), lit("/a/b/p"), id)
          .as("page_url"),
        page.as("html"))
    }
    def extractPath(df: DataFrame): Unit =
      noop(Corpus.extractContent(webPages(df), "html"))
    def linkRankPath(df: DataFrame): Unit = {
      val links = graft.operators.Links.outlinks(webPages(df), "page_url", "html")
      val hg = graft.operators.Links.hostGraph(links).filter(!col("internal"))
      noop(graft.operators.Links.pageRank(hg, "src_host", "dst_host",
        iterations = 3, weightCol = Some("n_links")))
    }
    def frontierPath(df: DataFrame): Unit = {
      val links = graft.operators.Links.outlinks(webPages(df), "page_url", "html")
      // production schedules from a STORED frontier (tools/PlanCrawl
      // pins the decoded frame for the same reason): unpinned, the
      // outlinks resolution tree substitutes into the distinct's
      // fused filter stage and melts janino past 64 KB (measured here
      // — the CLAUDE.md outlinks-consumer contract). The pin is part
      // of the timed run, as the frontier write would be.
      val urls = links.select(col("url")).distinct().localCheckpoint(true)
      val delays = urls
        .select(graft.operators.Robots.hostOf(col("url")).as("host")).distinct()
        .withColumn("crawl_delay",
          ((pmod(xxhash64(col("host")), lit(5L)) + 1L).cast("double")) / 2.0)
      noop(graft.operators.Frontier.schedule(urls, "url", delays,
        nWorkers = 64, maxPerHost = 1000L))
    }

    val paths: Seq[(String, DataFrame => Unit)] = Seq(
      "near_dup" -> (df => noop(nearDupPairs(df))),
      "dup_clusters" -> (df => noop(clusters(df))),
      "incremental_dedup" -> (df => incremental(df)),
      "span_removal" -> (df => spanRemoval(df)),
      "leakage_safe_split" -> (df => splitPath(df)),
      "tokenize_ship" -> (df => tokenizeShip(df)),
      "kn_score" -> (df => knPath(df)),
      "warc_roundtrip" -> (df => warcRoundtrip(df)),
      "media_dedup" -> (df => mediaDedup(df)),
      "bloom_seen" -> (df => bloomSeen(df)),
      "bloom_seen_join" -> (df => bloomSeenJoin(df)),
      "incremental_media_dedup" -> (df => incMediaDedup(df)),
      "ccnet_buckets_approx" -> (df => ccnetApprox(df)),
      "incremental_embedding_dedup" -> (df => incEmbDedup(df)),
      "extract_content" -> (df => extractPath(df)),
      "link_graph_rank" -> (df => linkRankPath(df)),
      "frontier_schedule" -> (df => frontierPath(df)),
      "incremental_dedup_probe" -> (df => incrementalProbeOnly(df, banded = false)),
      "incremental_dedup_banded_probe" -> (df => incrementalProbeOnly(df, banded = true)),
      "incremental_media_dedup_probe" -> (df => incMediaProbeOnly(df, banded = false)),
      "incremental_media_dedup_banded_probe" -> (df => incMediaProbeOnly(df, banded = true)))

    // pre-build the probe-only paths' indexes OUTSIDE the timed
    // section (a production index is written once and probed per
    // trigger — the write must not pollute the probe measurement)
    def prepareFor(names: Set[String]): Unit = {
      if (names("incremental_dedup_probe") ||
        names("incremental_dedup_banded_probe")) mhIdx
      if (names("incremental_media_dedup_probe") ||
        names("incremental_media_dedup_banded_probe")) imgIdx
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // between measurements, drop EVERYTHING the previous invocation
    // pinned: duplicateClusters localCheckpoints every iteration, and
    // those persisted RDDs otherwise accumulate across invocations in
    // this shared session until block-manager churn pollutes the next
    // timed run (first observed as a base run 3x its bench-isolated
    // time while the 10x corpus ran FASTER than base)
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val selected = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .map(names => paths.filter(p => names(p._1)))
      .getOrElse(paths)
    prepareFor(selected.map(_._1).toSet)
    val results = selected.map { case (name, run) =>
      clean()
      run(base) // discarded warmup: base JIT paid before either timed run
      clean()
      val b = time(run(base))
      clean()
      val a = time(run(amp))
      System.err.println(f"[rehearsal] $name base=$b%.2f amp=$a%.2f ratio=${a / b}%.2f (data x$factor)")
      (name, b, a)
    }
    val qs = results.map { case (n, b, a) =>
      f"""\"$n\":{\"base_sec\":$b%.3f,\"amp_sec\":$a%.3f,\"ratio\":${a / b}%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","factor":$factor,"base_docs":$nBase,""" +
      s""""amp_docs":$nAmp,"paths":$qs}""")
    spark.stop()
  }
}
