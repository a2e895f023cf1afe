package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - [[bruteForceTopK]] — exact top-k: one scan, per-partition heaps
  *   via TakeOrderedAndProject (no full sort, no shuffle of the data;
  *   only k rows per partition reach the driver-side merge). The
  *   correct baseline at any scale where a full scan is affordable.
  * - [[lshTopK]] / [[similarityJoin]] — random-hyperplane LSH: each
  *   vector gets a `bits`-bit signature; only same-bucket (or
  *   neighboring-bucket) candidates get exact scoring. Trades recall
  *   for a ~2^bits scan-reduction — the scale path for repeated
  *   queries / all-pairs search.
  *
  * Dot/norm/cosine are expression compositions (`zip_with` +
  * `aggregate`, left-to-right double accumulation — deterministic and
  * oracle-reproducible).
  */
object Similarity {

  /** Exact double dot product: products of float pairs are exact in
    * double; summation is left-to-right (deterministic). A native
    * codegen Expression ([[graft.functions.VecDot]]) — the composed
    * `aggregate(zip_with(…))` form is semantically identical but
    * CodegenFallback (interpreted lambda per element, intermediate
    * array per row) and it broke every embedding query's
    * WholeStageCodegen span. Same arithmetic order, same null
    * semantics → every oracle hash is unchanged. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def litVec(v: Array[Float]): Column =
    array(v.map(x => lit(x)): _*)

  /** Symmetric per-vector int8 quantization scale: `max|x| / 127`
    * (a tiny floor guards the zero vector — its codes quantize to 0
    * instead of NaN). Float max promotes to double exactly; the
    * division is one correctly-rounded op — engine-reproducible. */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x))), lit(1e-30))
      .cast(DoubleType) / lit(127.0)

  /** Int8 codes `round(x / scale)` for a STAGED scale column (stage
    * both as named columns — the HOF-staging contract; the lambda body
    * here is one divide + round per element). Codes live in [-127,127]
    * so a 4-byte-per-dim float column ships as 1 byte + one scale —
    * the memory/IO quarter that makes billion-vector ANN fit. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast(DoubleType) / scale).cast(IntegerType))

  /** Approximate dot product from staged codes + scales:
    * `(codesA · codesB) * scaleA * scaleB`. The code dot runs through
    * the native [[dot]] kernel over integer-VALUED doubles — every
    * product and partial sum is an exact integer (|sum| ≤ 127²·dim ≪
    * 2^53), so the accumulation is order-independent-exact and the
    * result matches any engine's integer math bit-for-bit; the two
    * scale multiplies are correctly-rounded IEEE ops. That exactness
    * is what lets a *quantized* similarity be hash-gated (q60), not
    * just spec'd approximately. */
  def int8Dot(codesA: Column, scaleA: Column, codesB: Column, scaleB: Column): Column =
    dot(codesA.cast(ArrayType(DoubleType)), codesB.cast(ArrayType(DoubleType))) *
      scaleA * scaleB

  /** Exact top-k nearest to `query` by the given measure. */
  def bruteForceTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      measure: String = "cosine"): DataFrame = {
    val q = litVec(query)
    val score = measure match {
      case "dot"    => dot(col(vecCol), q)
      case "cosine" => cosine(col(vecCol), q)
      case m        => throw new IllegalArgumentException(s"measure $m")
    }
    embeddings
      .select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded; same planes on every
    * executor — generated on the driver, shipped as literals). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** Pack sign bits of plane dot products into one long bucket id. */
  def signature(vec: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, litVec(p)) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: score only vectors whose signature is within
    * `probeRadius` bits of the query's signature (multi-probe LSH),
    * in ANY of `numTables` independent hash tables. More tables buy
    * recall linearly in scan fraction — the standard knob when a
    * single table's recall is too low (weak-neighbor-structure data).
    * probeRadius=bits degenerates to exact brute force. */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      bits: Int = 12,
      probeRadius: Int = 1,
      seed: Long = 42L,
      numTables: Int = 1,
      family: String = "prng"): DataFrame = {
    embeddings
      .filter(lshProbeColumn(col(vecCol), query, bits, probeRadius, seed, numTables, family))
      .select(col(idCol), cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** (r9) The fused-kernel candidate predicate behind [[lshTopK]]
    * ([[graft.functions.LshProbe]]): ONE generated call over a flat
    * hyperplane matrix with per-table early exit, instead of the
    * composed tables·bits-node predicate tree whose janino compile
    * alone dominated small scans (264 nodes at the q25 knobs).
    * Bit-identical candidate set to [[multiProbePredicate]] — same
    * planes, same sign convention, same left-to-right double dots —
    * which remains the compositional reference and the spec's
    * scan-fraction instrument; the parity spec asserts row equality
    * between the two on real embeddings. */
  def lshProbeColumn(
      vec: Column,
      query: Array[Float],
      bits: Int,
      probeRadius: Int,
      seed: Long = 42L,
      numTables: Int = 1,
      family: String = "prng"): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = query.length
    // "prng": Gaussian planes from the seeded JVM PRNG (production
    // default — best isotropy). "md5": Md5Family planes whose every
    // component a DuckDB twin re-derives (uniform in [-1000/1024,
    // 1000/1024], exact in float32 AND float64 — both engines see the
    // same dot signs). Same fused kernel either way.
    val perTable = (0 until numTables).map(t => family match {
      case "prng" => hyperplanes(dim, bits, seed + t)
      case "md5" => graft.functions.Md5Family.hyperplanes(dim, bits, t)
      case other => throw new IllegalArgumentException(s"lsh family '$other' (prng|md5)")
    })
    val flat = new Array[Float](numTables * bits * dim)
    var o = 0
    perTable.foreach(_.foreach { row =>
      System.arraycopy(row, 0, flat, o, dim); o += dim
    })
    val qSigs = perTable.map { planes =>
      planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
        if (d > 0) 1L << i else 0L
      }.reduce(_ | _)
    }.toArray
    ColumnBridge.column(graft.functions.LshProbe(
      ColumnBridge.expression(vec), flat, dim, bits, qSigs, probeRadius))
  }

  /** The candidate predicate behind [[lshTopK]], exposed so callers
    * (and the recall spec) can measure the SCAN FRACTION of a knob
    * setting with exactly the production predicate: a row is a
    * candidate if its signature is within `probeRadius` bits of the
    * query's in ANY of the `numTables` independent tables. */
  def multiProbePredicate(
      vec: Column,
      query: Array[Float],
      bits: Int,
      probeRadius: Int,
      seed: Long = 42L,
      numTables: Int = 1): Column =
    (0 until numTables).map { t =>
      val planes = hyperplanes(query.length, bits, seed + t)
      val qSig = planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
        if (d > 0) 1L << i else 0L
      }.reduce(_ | _)
      bit_count(signature(vec, planes).bitwiseXOR(lit(qSig))) <= probeRadius
    }.reduce((a, b) => a || b)

  /** Corpus-scale embedding near-duplicates: banded hyperplane-LSH
    * candidates → exact cosine verify on candidates ONLY — the
    * embedding analog of [[Dedup.nearDuplicates]], same scale
    * discipline: the `bits`-bit signature splits into `bands` chunks
    * (collide in ANY band ⇒ candidate), the pair join carries ids
    * only, degenerate buckets are capped, and the vector table is
    * staged behind one `repartition(id)` exchange that ReuseExchange
    * shares across signature computation and both verify re-attaches.
    *
    * Recall per pair at angle θ: a bit agrees with p = 1−θ/π, a
    * band of r bits with p^r, any of b bands with 1−(1−p^r)^b — the
    * defaults (64 bits, 16 bands of 4) give ≈ 1−7e-11 at cos 0.98
    * and ≈ 0.97 at cos 0.8.
    *
    * Tune bands to the threshold, BOTH ways: narrow bands buy recall
    * at low thresholds but admit chance collisions — for a
    * near-orthogonal corpus (p ≈ 0.5 per bit) a 4-bit band collides
    * 1/16 of the time, so 16 bands make ~64% of ALL pairs candidates
    * and the exact verify degenerates toward all-pairs (measured:
    * 50 s at 5.3k vectors). At thresholds ≥0.9 use wider bands
    * (bands=8 → rows=8: chance collisions ≈ 3%, recall at cos 0.99
    * still ≈ 1−1e-10).
    *
    * `maxSigHamming` (r16): an OPTIONAL whole-signature agreement
    * pre-filter on banded candidates BEFORE the exact-cosine verify
    * joins — `popcount(sig_a XOR sig_b) <= t` costs one XOR per
    * candidate row (signatures ride the bucket join, 8 B/side) and
    * kills chance collisions (expected hamming bits/2 ± √bits/2)
    * before they reach the heavy vector fetch. PROBABILISTIC: a true
    * pair at angle θ has hamming ~ Binomial(bits, θ/π) — pick t with
    * the same math as the band-recall formula (e.g. cos ≥ 0.9 ⇒
    * mean ≈ 9.2 of 64, σ ≈ 2.9; t = 24 is a +5σ keep). None (the
    * default) = exact pre-r16 behavior, no filter, no sig carry. */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      dim: Int,
      bits: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      maxBucket: Int = 1000,
      maxSigHamming: Option[Int] = None): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val rows = bits / bands
    val planes = hyperplanes(dim, bits, seed)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(col("id"))
    // aggregate barrier: without it, project collapse inlines the
    // 64-dot-product signature tree into each of the 16 band shifts
    // below AND every downstream branch (the q132 explode hazard,
    // LSH spelling — a repartition is not an alias boundary); ids
    // are unique, so first() is exact, and the groupBy rides the
    // id-exchange without an extra shuffle
    val sigs = vecs.select(col("id"), signature(col("vec"), planes).as("sig"))
      .groupBy(col("id")).agg(first(col("sig")).as("sig"))
    // bucket census as a COUNT WINDOW over one explicit (band, chunk)
    // exchange (r19 — the Dedup.hammingCandidates treatment): the
    // groupBy census + semi-join form put the signature subtree (64
    // dot products per vector + the aggregate barrier) on THREE
    // branches above the shared id exchange (census + both join
    // sides) — the id exchange shares the vector SCAN but not the
    // signature computation. Staged behind its own bucket-keyed
    // exchange, both join sides replay one map stage and the census
    // rides the window; the window's partition sort pre-sorts the
    // pair join's keys. Identical row survival (window count = group
    // count over the same rows).
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rows).bitwiseAND((1L << rows) - 1)): _*))
        .as(Seq("band", "chunk")))
      .repartition(col("band"), col("chunk"))
    val pruned = banded
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("chunk"))))
      .filter(col("_n") <= maxBucket && col("_n") >= 2)
    val carry = maxSigHamming.isDefined
    def side(suffix: String) = pruned.select(
      Seq(col("band"), col("chunk"), col("id").as(s"id_$suffix")) ++
        (if (carry) Seq(col("sig").as(s"_sig_$suffix")) else Nil): _*)
    val joined = side("a").join(side("b"), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
    val pairs = maxSigHamming.fold(joined) { t =>
      joined.filter(
        bit_count(col("_sig_a").bitwiseXOR(col("_sig_b"))) <= t)
    }
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("_va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("_vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("_va"), col("_vb")).as("score"))
      .filter(col("score") >= minCosine)
  }

  // === Incremental embedding near-dup (persisted LSH index, r12) ===
  //
  // The third leg of the incremental-dedup story (text MinHash
  // r6, hamming media r12): a new embedding batch pairs against
  // history through a persisted hyperplane-LSH signature index
  // without re-signing the corpus. Same persisted-index discipline
  // as the other two: a parameter marker (dim, bits, seed — the
  // planes are deterministic from exactly these, so a probe with
  // different params banding-mismatches silently without the
  // refusal), staged appends, refreshByPath. The index stores
  // `(id, sig)` only (16 B/row); exact-cosine verification fetches
  // vectors for CANDIDATE ids from the corpus table via a semi-join,
  // the incrementalNearDuplicates shape — the index never carries
  // the heavy vector column.

  private val LshIndexFamily = "hyperplane-lsh-v1"

  private def markerFs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLshMarker(spark: org.apache.spark.sql.SparkSession,
      path: String, dim: Int, bits: Int, seed: Long,
      bands: Int = 0, ranges: Int = 0): Unit = {
    val base = graft.util.IndexMarker.of(
      "family" -> LshIndexFamily, "dim" -> dim, "bits" -> bits, "seed" -> seed)
    val m = if (bands > 0) base.withLayout(bands, ranges) else base
    m.write(markerFs(spark, path), path)
  }

  private def checkLshMarker(spark: org.apache.spark.sql.SparkSession,
      path: String, dim: Int, bits: Int, seed: Long): Unit = {
    val m = graft.util.IndexMarker.read(markerFs(spark, path), path).getOrElse(
      throw new IllegalArgumentException(
        s"signature index at $path has no parameter marker — refusing to probe blind"))
    val fam = m.str("family").getOrElse("?")
    require(fam == LshIndexFamily,
      s"index at $path was built with family '$fam', this probe uses " +
        s"'$LshIndexFamily' — families are not interchangeable")
    for ((k, v) <- Seq("dim" -> dim.toLong, "bits" -> bits.toLong, "seed" -> seed))
      m.long(k).foreach(got => require(got == v,
        s"index at $path has $k=$got, probe uses $v — " +
          "hyperplanes derive from (dim, bits, seed); mismatched params never collide"))
  }

  /** Write (or append) the corpus embedding-signature index:
    * `(id, sig)` parquet under a (dim, bits, seed) marker.
    *
    * `bands > 0` selects the BANDED layout (r13, the
    * [[Dedup.hammingWriteIndex]] move): rows stored pre-banded as
    * `(band, chunk, id, sig)` under a `pblock` partition column so
    * incremental probes prune to the batch's touched blocks at
    * planning instead of re-banding the whole index. Banding geometry
    * is baked at write (marker-enforced on probes and appends). */
  def cosineWriteIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, bits: Int = 64, seed: Long = 42L,
      mode: String = "overwrite", bands: Int = 0, ranges: Int = 64): Unit = {
    val spark = df.sparkSession
    Dedup.indexWriteLocked(spark, path) {
      if (mode == "append") {
        checkLshMarker(spark, path, dim, bits, seed)
        val existing = Dedup.markerLayout(spark, path)
        require(existing == (if (bands > 0) Some((bands, ranges)) else None),
          s"index at $path has layout ${existing.getOrElse("flat")}, " +
            s"append presents ${if (bands > 0) s"banded($bands,$ranges)" else "flat"} — " +
            "layouts are baked at the first write")
      }
      val planes = hyperplanes(dim, bits, seed)
      val sigs = df.select(col(idCol).as("id"), signature(col(vecCol), planes).as("sig"))
      if (bands <= 0) sigs.write.mode(mode).parquet(path)
      else {
        require(bits % bands == 0, "bands must divide bits")
        require(ranges >= 1, s"ranges must be >= 1, got $ranges")
        val rows = bits / bands
        // aggregate barrier before the 16-way sig fan-out: project
        // collapse would otherwise inline the 64-dot-product
        // signature tree into EVERY shift expression (the q132
        // explode hazard, LSH spelling); ids are unique, so first()
        // is exact
        sigs.groupBy(col("id")).agg(first(col("sig")).as("sig"))
          .select(col("id"), col("sig"),
            posexplode(array((0 until bands).map(b =>
              shiftright(col("sig"), b * rows).bitwiseAND((1L << rows) - 1)): _*))
              .as(Seq("band", "chunk")))
          .withColumn("pblock",
            (col("band") * ranges + pmod(col("chunk"), lit(ranges))).cast(IntegerType))
          .repartition(col("pblock")) // one file per touched pblock
          .write.mode(mode).partitionBy("pblock").parquet(path)
      }
      writeLshMarker(spark, path, dim, bits, seed,
        if (bands > 0) bands else 0, if (bands > 0) ranges else 0)
      spark.catalog.refreshByPath(path)
    }
  }

  /** The flat `(id, sig)` view of a persisted embedding-LSH index,
    * either layout — banded indexes serve it from the band-0 slice
    * (one row per id, partition-pruned), the
    * [[graft.operators.Dedup.minhashIndexFlat]] convention. */
  def cosineIndexFlat(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = Dedup.markerLayout(spark, path) match {
    case Some((_, ranges)) =>
      spark.read.parquet(path)
        .filter(col("pblock") < ranges && col("band") === 0)
        .select(col("id"), col("sig"))
    case None => spark.read.parquet(path).select(col("id"), col("sig"))
  }

  /** Incremental embedding near-dup pairs: a NEW batch against the
    * persisted signature index plus itself — only pairs touching the
    * batch enter the plan (batch bands probe the union's buckets;
    * old-old collisions never materialize; the degenerate-bucket
    * census runs over the UNION). `corpus` supplies vectors for old
    * candidate ids (the table the index was built from; ids disjoint
    * from the batch's). Returns `(id_a, id_b, score)`,
    * `score >= minCosine`, `id_a < id_b`. */
  def incrementalCosineNearDuplicates(
      spark: org.apache.spark.sql.SparkSession,
      newDf: DataFrame, idCol: String, vecCol: String,
      indexPath: String, corpus: DataFrame,
      minCosine: Double, dim: Int, bits: Int = 64, bands: Int = 16,
      seed: Long = 42L, maxBucket: Int = 1000,
      maxSigHamming: Option[Int] = None): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    checkLshMarker(spark, indexPath, dim, bits, seed)
    val rows = bits / bands
    val planes = hyperplanes(dim, bits, seed)
    val newVecs = newDf.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(col("id"))
    // aggregate barrier (see cosineCandidates): one signature
    // evaluation per row, attributes above
    val newSigs = newVecs.select(col("id"), signature(col("vec"), planes).as("sig"))
      .groupBy(col("id")).agg(first(col("sig")).as("sig"))
    def bandedOf(sigs: DataFrame) = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rows).bitwiseAND((1L << rows) - 1)): _*))
        .as(Seq("band", "chunk")))
    val newBanded = bandedOf(newSigs)
    val idxBanded = Dedup.markerLayout(spark, indexPath) match {
      case Some((idxBands, ranges)) =>
        // banded layout (r13): read only the batch's touched blocks —
        // the Dedup.incrementalHammingCandidates contract, same
        // bounded collect (≤ bands·ranges distinct ints)
        require(idxBands == bands,
          s"banded index at $indexPath was written with bands=$idxBands, " +
            s"probe uses $bands — banding geometry is baked at write")
        val touched = newBanded
          .select(((col("band") * ranges + pmod(col("chunk"), lit(ranges)))
            .cast(IntegerType)).as("pblock"))
          .distinct().collect().map(r => Integer.valueOf(r.getInt(0))).toSeq
        spark.read.parquet(indexPath)
          .filter(if (touched.isEmpty) lit(false)
            else col("pblock").isin(touched: _*))
          .select(col("id"), col("sig"), col("band"), col("chunk"))
      case None =>
        bandedOf(spark.read.parquet(indexPath))
    }
    // NOTE (r19): the batch kernel's window-census treatment was
    // tried here too (tagged union + one (band, chunk) exchange +
    // count window) and measured SLOWER on q122's composite
    // 2-batch plan (old 4.14 s → windowed 4.85 s same-session quiet
    // A/B) — the census/any-side duplication it removes is
    // batch-bounded here (the pblock collect already prunes the
    // index read to touched blocks), while the added
    // exchange+sort+window stages multiply across the per-batch
    // incremental calls. Reverted; the measurement is the record.
    val allBanded = idxBanded.unionByName(newBanded)
    val keep = allBanded.groupBy(col("band"), col("chunk"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket && col("_n") >= 2)
      .select(col("band"), col("chunk"))
    val joined = newBanded.join(keep, Seq("band", "chunk"))
      .select(col("band"), col("chunk"), col("id").as("_id_new"),
        col("sig").as("_sig_new"))
      .join(allBanded.select(col("band"), col("chunk"), col("id").as("_id_any"),
        col("sig").as("_sig_any")), Seq("band", "chunk"))
      .filter(col("_id_new") =!= col("_id_any"))
    // whole-signature agreement pre-filter (see cosineNearDuplicates):
    // XOR is symmetric, so it runs before the (min,max) normalization
    val pairs = maxSigHamming.fold(joined) { t =>
      joined.filter(
        bit_count(col("_sig_new").bitwiseXOR(col("_sig_any"))) <= t)
    }
      .select(least(col("_id_new"), col("_id_any")).as("id_a"),
        greatest(col("_id_new"), col("_id_any")).as("id_b"))
      .distinct()
    // exact-cosine verify: vectors fetched ONLY for candidate ids
    val candidateIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .unionByName(newVecs)
      .join(candidateIds, Seq("id"), "left_semi")
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("_va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("_vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("_va"), col("_vb")).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** All-pairs similarity join: bucket by the FULL LSH signature,
    * score only identical-signature pairs, keep those above
    * `threshold`. Small-scale convenience (exact-signature match has
    * poor recall at modest thresholds); the corpus entry point is
    * [[cosineNearDuplicates]]. */
  def similarityJoin(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 12,
      seed: Long = 42L,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", signature(col("vec"), planes))
    val l = sigs.select(col("sig"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = sigs.select(col("sig"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** IVF-style coarse quantization: assign each vector to its nearest
    * of `centroids`, search only the query's cell (+`nprobe`-1 next
    * cells). Centroids come from a driver-side sample — the classic
    * IVF trade: tiny training cost, big scan reduction. */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Array[Array[Float]]): DataFrame = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(dot(col(vecCol), litVec(c)).as("s"), lit(i).as("cell"))
    }
    df.withColumn("_cell", greatest(dists: _*).getField("cell"))
  }

  /** The query's `nprobe` best cells (driver-side — centroid count is
    * tiny by construction). */
  private def probeCells(query: Array[Float], centroids: Array[Array[Float]],
      nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (c.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum, i) }
      .sortBy(-_._1).take(nprobe).map(_._2).toSeq

  def ivfTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      centroids: Array[Array[Float]],
      nprobe: Int = 1): DataFrame =
    ivfAssign(embeddings, vecCol, centroids)
      .filter(col("_cell").isin(probeCells(query, centroids, nprobe): _*))
      .select(col(idCol), cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Spherical k-means for IVF centroids, trained IN Spark — the
    * driver never holds more than k×dim doubles. Init is the k
    * lowest-id vectors (deterministic); each Lloyd round assigns by
    * max dot (the same measure [[ivfAssign]] queries with — training
    * and probing must agree or cell boundaries lie), recomputes each
    * cell's elementwise mean via `posexplode` + per-(cell,pos)
    * aggregation (map-side partials; the shuffle carries k×dim
    * partial sums, never vectors), and L2-normalizes. Empty cells
    * keep their previous centroid.
    *
    * Scale shape: one scan + one tiny shuffle per round. At corpus
    * scale pass a sample (`df.sample(…)`) — k-means quality needs
    * only ~100× k points, not the corpus. */
  def trainCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 3): Array[Array[Float]] = {
    var centroids = df.orderBy(col(idCol)).limit(k)
      .select(vecCol).collect().map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val means = ivfAssign(df, vecCol, centroids)
        .select(col("_cell"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
        .groupBy(col("_cell"), col("_pos"))
        .agg(avg(col("_v").cast(DoubleType)).as("_m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(rows) =>
            val m = new Array[Double](old.length)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(m.map(x => x * x).sum)
            if (n == 0.0) old else m.map(x => (x / n).toFloat)
          case None => old
        }
      }
    }
    centroids
  }

  /** PERSISTED IVF index: cell assignments written once as parquet
    * PARTITIONED BY the cell id. Queries then read only their probed
    * cells via partition pruning — the assignment scan (the expensive
    * part: |centroids| dot products per vector) is paid once at build
    * time instead of per query, and the storage layout IS the index.
    * The repeated-query ANN path at scale; [[ivfTopK]] remains the
    * one-shot form. */
  def ivfWriteIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Float]],
      path: String): Unit =
    ivfAssign(embeddings, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("_cell"))
      .repartition(col("_cell"))
      .write.mode("overwrite").partitionBy("_cell").parquet(path)

  /** Top-k over a persisted index: scan ONLY the probed cell
    * partitions (`PartitionFilters` in the plan — no data outside
    * them is listed or read). `nprobe = centroids.length` degenerates
    * to exact brute force, which is how the driver gate oracles the
    * whole index write/read path. */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      centroids: Array[Array[Float]],
      nprobe: Int = 1): DataFrame =
    spark.read.parquet(indexPath)
      .filter(col("_cell").isin(probeCells(query, centroids, nprobe): _*))
      .select(col(idCol), cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  // ---- Product quantization (PQ) ------------------------------------
  //
  // The billion-vector compression standard (Jégou et al. 2011,
  // FAISS IVF-PQ): split each dim-D vector into `m` subspaces, k-means
  // each subspace independently, store one centroid index per subspace
  // — m bytes/vector at k ≤ 256 vs 4·D for floats (32× at D=64, m=8).
  // Queries score codes with an Asymmetric Distance Computation (ADC)
  // table: the m×k sub-dot products are computed ONCE driver-side,
  // then every row's score is m array lookups + a sum — no vector
  // arithmetic per row at all, which is what makes a 100 TB code
  // table scannable. Codebook shape: codebook(s)(j) = centroid j of
  // subspace s, each of length D/m.

  /** The codebook as a broadcastable table `(_sub, _code, _cent,
    * _half)` with `_half = ‖c‖²/2` precomputed — assignment under
    * squared L2 is then argmax(x·c − ‖c‖²/2), the measure FAISS
    * trains PQ with. Relational on purpose: an expression-tree argmin
    * (a `greatest` over k struct branches) melts janino past a few
    * dozen centroids, and k=256 is the PQ standard. */
  private def codebookDf(df: DataFrame,
      codebook: Array[Array[Array[Float]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    codebook.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, j) =>
        (s, j, c.toSeq, c.map(x => x.toDouble * x.toDouble).sum / 2.0)
      }
    }.toSeq.toDF("_sub", "_code", "_cent", "_half")
  }

  /** Scored (row, subspace, centroid) tuples `(_pqid, _sub, _sv,
    * _sc = struct(score, code))`: explode each vector into its m
    * sub-vectors (map-side), broadcast-join all centroids of the
    * matching subspace, score each — k·D multiplies per row in total,
    * identical FLOPs to IVF assignment against k full centroids.
    * Argmax happens downstream as `max(_sc)` (lexicographic on
    * (score, code) — ties to the higher code, deterministic), which
    * is partial-aggregable, so consumers combine map-side. */
  private def pqScoredSubs(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Float]]]): DataFrame = {
    val m = codebook.length
    require(m > 0, "empty codebook")
    val subDim = codebook(0)(0).length
    val subs = df.select(col(idCol).as("_pqid"),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol), s * subDim + 1, subDim)): _*)).as(Seq("_sub", "_sv")))
    subs.join(broadcast(codebookDf(df, codebook)), Seq("_sub"))
      .select(col("_pqid"), col("_sub"), col("_sv"),
        struct((dot(col("_sv"), col("_cent")) - col("_half")).as("_s"),
          col("_code").as("_c")).as("_sc"))
  }

  /** Encode vectors to PQ codes `(idCol, codes: array<int>)`. One
    * hash aggregation keyed on the row id with m `max(when(sub=s,
    * scored))` argmax slots — map-side combine reduces each partition
    * to one row per id BEFORE the shuffle, and what shuffles is m
    * (double, int) structs per row, never sub-vectors. */
  def pqEncode(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Float]]]): DataFrame = {
    val m = codebook.length
    val codeCols = (0 until m).map(s =>
      max(when(col("_sub") === s, col("_sc"))).getField("_c").as(s"_c$s"))
    pqScoredSubs(df, idCol, vecCol, codebook)
      .groupBy(col("_pqid"))
      .agg(codeCols.head, codeCols.tail: _*)
      .select(col("_pqid").as(idCol),
        array((0 until m).map(s => col(s"_c$s")): _*).as("codes"))
  }

  /** Train a PQ codebook: per-subspace Lloyd k-means under squared L2
    * (init: the k lowest-id sub-vectors, deterministic — matching
    * [[trainCentroids]]'s discipline). One scan per iteration covers
    * ALL subspaces at once: assignment emits (subspace, cell, pos,
    * value) and the shuffle carries m·k·subDim partial means, never
    * vectors; the driver holds only the m·k·subDim codebook. Train on
    * a sample at corpus scale — PQ quality needs ~100·k points per
    * subspace, not the corpus. */
  def pqTrainCodebook(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): Array[Array[Array[Float]]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    var codebook: Array[Array[Array[Float]]] =
      df.orderBy(col(idCol)).limit(k).select(vecCol).collect()
        .map(_.getSeq[Float](0).toArray) match {
          case seeds =>
            Array.tabulate(m)(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
        }
    for (_ <- 0 until iters) {
      // one scan covers all m subspaces (pqScoredSubs explodes each
      // row into its m sub-vectors once); the per-(row, subspace)
      // argmax is a combinable max(struct)
      val means = pqScoredSubs(df, idCol, vecCol, codebook)
        .groupBy(col("_pqid"), col("_sub"))
        .agg(first(col("_sv")).as("_sv"), // constant within the group
          max(col("_sc")).getField("_c").as("_cell"))
        .select(col("_sub"), col("_cell"),
          posexplode(col("_sv")).as(Seq("_pos", "_x")))
        .groupBy(col("_sub"), col("_cell"), col("_pos"))
        .agg(avg(col("_x").cast(DoubleType)).as("_m"))
        .collect()
      val bySub = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      codebook = Array.tabulate(m) { s =>
        codebook(s).zipWithIndex.map { case (old, j) =>
          bySub.get((s, j)) match {
            case Some(rows) =>
              val c = new Array[Float](subDim)
              rows.foreach(r => c(r.getInt(2)) = r.getDouble(3).toFloat)
              c
            case None => old // empty cell keeps its previous centroid
          }
        }
      }
    }
    codebook
  }

  /** Degenerate exact codebook: every distinct sub-vector is its own
    * centroid, so encoding is lossless and ADC reproduces the grouped
    * exact dot bit-for-bit — the oracle-gateable configuration (the
    * same trick `ivfTopKFromIndex` uses with nprobe=all). Collects
    * m × |distinct sub-vectors| floats — a GATE/TEST device for
    * bounded sets, never the production path. */
  def pqCodebookExact(df: DataFrame, vecCol: String, m: Int): Array[Array[Array[Float]]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      df.select(slice(col(vecCol), s * subDim + 1, subDim).as("_s")).distinct()
        .orderBy(col("_s").cast(ArrayType(DoubleType)).cast(StringType))
        .collect().map(_.getSeq[Float](0).toArray)
    }
  }

  /** PERSISTED IVF-PQ index (the FAISS composition): coarse-quantize
    * every vector to an IVF cell, PQ-encode it, and write ONLY
    * `(id, codes)` partitioned by cell — m bytes of payload per
    * vector instead of 4·D, and queries read just their probed cell
    * partitions. The 100 TB serving shape: the index for 10^12
    * vectors at m=8 is ~8 TB of codes vs 256 TB of floats, and a
    * query touches nprobe/k of it via partition pruning. */
  def pqIvfWriteIndex(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      codebook: Array[Array[Array[Float]]],
      path: String): Unit =
    ivfAssign(embeddings, vecCol, centroids)
      .select(col(idCol), col(vecCol), col("_cell"))
      .join(pqEncode(embeddings, idCol, vecCol, codebook), Seq(idCol))
      .select(col(idCol), col("codes"), col("_cell"))
      .repartition(col("_cell"))
      .write.mode("overwrite").partitionBy("_cell").parquet(path)

  /** ADC top-k over a persisted IVF-PQ index: scan only the probed
    * cell partitions (`PartitionFilters`), score codes against the
    * driver-built lookup table — no vector arithmetic per row, no
    * vector data read at all. `nprobe = centroids.length` plus a
    * lossless codebook degenerates to exact subspace-grouped search,
    * which is how the driver gate oracles the whole write/read/prune
    * path. */
  def pqIvfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, idCol: String,
      query: Array[Float],
      centroids: Array[Array[Float]],
      codebook: Array[Array[Array[Float]]],
      k: Int, nprobe: Int = 1): DataFrame =
    pqAdcTopK(
      spark.read.parquet(indexPath)
        .filter(col("_cell").isin(probeCells(query, centroids, nprobe): _*)),
      idCol, query, codebook, k)

  /** ADC shortlist → EXACT re-rank (the standard FAISS search shape):
    * the codes-only index proposes `shortlist` candidates by ADC, the
    * true vectors of ONLY those candidates are fetched (semi-join on
    * id — candidates ≪ corpus, prunes like any id-keyed join) and
    * re-scored with the exact dot, recovering exact ordering among
    * the shortlist. Quantization error then only costs recall (a true
    * neighbor missing the shortlist), never ranking error. */
  def pqIvfTopKRerank(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Float],
      centroids: Array[Array[Float]],
      codebook: Array[Array[Array[Float]]],
      k: Int, shortlist: Int, nprobe: Int = 1): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val candidates = pqIvfTopKFromIndex(spark, indexPath, idCol, query,
      centroids, codebook, shortlist, nprobe).select(col(idCol))
    embeddings.join(candidates, Seq(idCol), "left_semi")
      .select(col(idCol), dot(col(vecCol), litVec(query)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** ADC top-k over an encoded table: lookup table `t(s)(j) =
    * q_s · c(s)(j)` built driver-side (m·k sub-dots in the same
    * left-to-right double arithmetic as [[dot]]), per-row score =
    * Σ_s t(s)(codes_s) summed in subspace order — m array lookups per
    * row. The score equals the exact dot grouped by subspace when the
    * codebook is lossless ([[pqCodebookExact]]), which is what the
    * driver gate hashes against. */
  def pqAdcTopK(
      codes: DataFrame, idCol: String,
      query: Array[Float], codebook: Array[Array[Array[Float]]],
      k: Int): DataFrame = {
    val m = codebook.length
    val subDim = codebook(0)(0).length
    require(query.length == m * subDim,
      s"query dim ${query.length} != codebook dim ${m * subDim}")
    val table: Array[Array[Double]] = Array.tabulate(m) { s =>
      val qs = query.slice(s * subDim, (s + 1) * subDim)
      codebook(s).map { c =>
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += qs(i).toDouble * c(i).toDouble; i += 1 }
        acc
      }
    }
    val lut = array(table.map(row => array(row.map(lit(_)): _*)): _*)
    val score = (0 until m).map { s =>
      element_at(element_at(lut, s + 1), col("codes").getItem(s) + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup by clustering
    * embeddings and pruning near-identical vectors WITHIN each
    * cluster — the fidelity-first complement to the LSH near-dup
    * path ([[cosineNearDuplicates]] scales better; this one computes
    * every within-cluster similarity exactly, which is the published
    * algorithm). A vector is dropped when a LOWER-id vector in its
    * cluster has cosine ≥ `threshold` (greedy lowest-id keep — the
    * engine's standard deterministic tie rule). Returns every input
    * id with its cluster and an `is_kept` flag.
    *
    * Scale shape and its honest boundary: assignment is RELATIONAL
    * argmax (rows × k against a broadcast centroid table, combinable
    * `max(struct)` — no k-way expression tree, so production k won't
    * melt janino), but the within-cluster comparison is QUADRATIC in
    * cluster size BY DESIGN — SemDeDup's own contract is "pick k so
    * clusters are small" (the paper uses k = 11k for 134M docs,
    * ~12k/cluster). `maxClusterSize` enforces that contract up
    * front: the size census is one combinable agg + a scalar action,
    * and an oversized cluster fails loudly with the remedy (raise k)
    * instead of handing a reducer n² work.
    *
    * The assignment is PINNED (eager checkpoint) before the census:
    * `assigned` feeds four downstream consumers (census, both sides
    * of the quadratic self-join, the final keep-flag join), and
    * without the pin Catalyst recomputes the rows × k argmax for each
    * — 2–4× the dominant scan. `checkpointDir` selects reliable
    * checkpointing for executor-loss-tolerant runs (the
    * [[graft.operators.Dedup.duplicateClusters]] contract); None →
    * `localCheckpoint` (fast, fragile). The RETURNED frame holds no
    * pin: the keep-flags are rewritten to parquet
    * ([[graft.Pins.materializeResult]]) and the assignment pin is
    * released before returning — `Dataset.unpersist` would not free
    * it (see [[graft.Pins]]), and without the release a long-lived
    * driver calling this repeatedly accumulates corpus-sized blocks. */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double,
      maxClusterSize: Long = 1L << 17,
      checkpointDir: Option[String] = None): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    checkpointDir.foreach { dir =>
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(dir)
    }
    val cdf = broadcast(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toSeq.toDF("_cell", "_cvec"))
    val assigned0 = df.select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .join(cdf)
      .select(col("_id"), col("_vec"),
        struct(dot(col("_vec"), col("_cvec")).as("_s"), (-col("_cell")).as("_nc")).as("_sc"))
      .groupBy(col("_id"), col("_vec"))
      .agg(max(col("_sc")).as("_w"))
      .select(col("_id"), col("_vec"), (-col("_w._nc")).as("cell"))
    val assigned =
      if (checkpointDir.isDefined) assigned0.checkpoint()
      else assigned0.localCheckpoint()
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_n"))
    val maxRow = sizes.agg(max(col("_n"))).collect()(0)
    // empty input → max(_n) is NULL; treat as 0 so the result is empty
    // rather than an NPE out of getLong
    val maxSize = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    require(maxSize <= maxClusterSize,
      s"semDedup: largest cluster has $maxSize vectors (> $maxClusterSize); " +
        "raise the centroid count k — within-cluster comparison is quadratic by design")
    val a = assigned.select(col("cell"), col("_id").as("_ida"), col("_vec").as("_va"))
    val b = assigned.select(col("cell"), col("_id").as("_idb"), col("_vec").as("_vb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("_ida") < col("_idb"))
      .filter(cosine(col("_va"), col("_vb")) >= threshold)
      .select(col("_idb").as("_id")).distinct()
    val flags = assigned
      .join(dropped.withColumn("_drop", lit(true)), Seq("_id"), "left")
      .select(col("_id").as(idCol), col("cell"),
        coalesce(!col("_drop"), lit(true)).as("is_kept"))
    val out = graft.Pins.materializeResult(flags, checkpointDir, "semdedup")
    graft.Pins.release(assigned, deleteCheckpointFiles = true)
    out
  }

  /** Pool chunk embeddings into one vector per group — the
    * chunk→document aggregation every retrieval pipeline runs after
    * embedding windowed chunks ([[graft.operators.Chunking]] makes
    * the chunks; this folds their vectors back). `mode`: `"max"` /
    * `"min"` (element-wise extremes — order-independent and EXACT in
    * IEEE doubles, hence hash-gateable cross-engine, q101), `"mean"`
    * / `"sum"` (float accumulation — rows/spec territory, the q58
    * sum-order rule).
    *
    * Shape: posexplode (map-side) → one combinable (id, dim) hash
    * aggregate → per-id array rebuild via sorted collect_list
    * (bounded by the DIMENSION, never by chunk count — the
    * dedupLines reassembly idiom). One shuffle on (id, dim), one on
    * id; linear at any corpus size.
    *
    * Precondition: all embeddings within a group share one length.
    * Jagged input would misalign the rebuilt array (a short vector
    * simply contributes nothing to its missing trailing dims), so it
    * FAILS LOUDLY — per-dimension chunk counts that disagree within
    * a group raise an error naming the group instead of returning a
    * silently wrong pooled vector. */
  def poolEmbeddings(df: DataFrame, idCol: String, embCol: String,
      mode: String = "mean"): DataFrame = {
    val agg: Column => Column = mode match {
      case "max" => max
      case "min" => min
      case "sum" => sum
      case "mean" => avg
      case other => throw new IllegalArgumentException(
        s"poolEmbeddings mode '$other' (max|min|sum|mean)")
    }
    df.select(col(idCol).as("id"),
        posexplode(col(embCol)).as(Seq("_pos", "_v")))
      .groupBy(col("id"), col("_pos"))
      .agg(agg(col("_v").cast(DoubleType)).as("_pv"),
        count(lit(1)).as("_n"))
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("_pos"), col("_pv")))),
          s => s.getField("_pv")).as("pooled"),
        max(col("_n")).as("_nmax"),
        min(col("_n")).as("_nmin"))
      .select(col("id"), col("pooled"),
        when(col("_nmin") === col("_nmax"), col("_nmax"))
          .otherwise(raise_error(concat(
            lit("poolEmbeddings: jagged embedding lengths in group "),
            col("id").cast(StringType)))).as("n_chunks"))
  }
}
