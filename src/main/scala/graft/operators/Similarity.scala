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
      numTables: Int = 1): DataFrame =
    embeddings
      .filter(multiProbePredicate(col(vecCol), query, bits, probeRadius, seed, numTables))
      .select(col(idCol), cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

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
    * still ≈ 1−1e-10). */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      dim: Int,
      bits: Int = 64,
      bands: Int = 16,
      seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val rows = bits / bands
    val planes = hyperplanes(dim, bits, seed)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(col("id"))
    val sigs = vecs.select(col("id"), signature(col("vec"), planes).as("sig"))
    val banded = sigs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rows).bitwiseAND((1L << rows) - 1)): _*))
        .as(Seq("band", "chunk")))
    val keep = banded.groupBy(col("band"), col("chunk"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket && col("_n") >= 2)
      .select(col("band"), col("chunk"))
    val pruned = banded.join(keep, Seq("band", "chunk"))
    val l = pruned.select(col("band"), col("chunk"), col("id").as("id_a"))
    val r = pruned.select(col("band"), col("chunk"), col("id").as("id_b"))
    val pairs = l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
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
}
