package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale shape: everything is shuffle-on-key + bounded fan-out. The
  * LSH band join only pairs documents sharing a band bucket, so the
  * candidate set is ~linear for non-adversarial corpora instead of the
  * O(n²) all-pairs join; `maxBucket` caps adversarial buckets (a
  * stopword-shingle bucket with 1M docs would otherwise explode one
  * reducer — the classic skew failure at 100 TB).
  */
object Dedup {

  /** Exact dedup: first row per normalized-content hash. */
  def exact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_fp", Text.fingerprint(col(textCol)))
      .dropDuplicates("_fp")
      .drop("_fp")

  /** Exact-dup group stats (hash-groupBy). */
  def exactGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"))

  /** Word k-shingles of the normalized text. */
  def shingles(c: Column, k: Int): Column = {
    val toks = Text.tokens(Text.normalized(c))
    val cnt = greatest(size(toks) - lit(k - 1), lit(0))
    slice(
      transform(sequence(lit(1), greatest(cnt, lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(k)))),
      lit(1), cnt)
  }

  /** MinHash signature: H independent permutation-minima, hash i =
    * min over shingles of xxhash64(shingle, i). One expression — no
    * explode, no shuffle; H·|shingles| hashes per row, codegen'd. */
  def minhashSignature(c: Column, numHashes: Int, shingleK: Int): Column = {
    val sh = shingles(c, shingleK)
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)
  }

  /** MinHash-estimated Jaccard = fraction of agreeing signature slots. */
  def minhashEstimate(sigA: Column, sigB: Column, numHashes: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v).cast(DoubleType) / lit(numHashes.toDouble)

  /** LSH near-dup candidate pairs.
    *
    * signature → `bands` buckets of `numHashes/bands` rows each; a
    * pair collides if any band hashes equal. Implemented as
    * explode(bands) → self-equi-join on (band, bandHash) → distinct
    * pair → signature-agreement estimate ≥ `minEstimate`.
    *
    * @param maxBucket drop degenerate buckets larger than this before
    *                  pairing (skew guard; dropped buckets are almost
    *                  always boilerplate shingles, and true dups still
    *                  collide in their other bands).
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleK: Int = 3,
      minEstimate: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleK).as("sig"))

    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws("_", (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1)): _*))): _*))
        .as(Seq("band", "band_hash")))

    val pruned = banded.withColumn("_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))))
      .filter(col("_n") <= maxBucket && col("_n") >= 2)
      .drop("_n")

    val l = pruned.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = pruned.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        minhashEstimate(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstimate)
  }

  /** Exact Jaccard similarity between the distinct shingle sets. */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val sa = array_distinct(shingles(a, k))
    val sb = array_distinct(shingles(b, k))
    size(array_intersect(sa, sb)).cast(DoubleType) /
      greatest(size(array_union(sa, sb)), lit(1)).cast(DoubleType)
  }

  /** Per-bit vote sums of the 64-bit SimHash: each token hashes once
    * (`transform` then `aggregate`), its hash votes +1/-1 on every
    * bit. Shift amounts must be literals, so the 64 bits unroll into
    * one array expression. */
  def simhashVotes(c: Column): Column =
    aggregate(
      transform(Text.tokens(Text.normalized(c)), w => xxhash64(w)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(
        acc,
        array((0 until 64).map(i => shiftright(h, i).bitwiseAND(1L)): _*),
        (a, b) => a + when(b === 1L, 1).otherwise(-1)))

  /** Pack vote signs into the 64-bit SimHash value. Feed a *named*
    * votes column (e.g. via [[simhashVotes]] in a prior projection) so
    * the aggregate evaluates once, not 64 times. */
  def packVotes(votes: Column): Column =
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))

  /** 64-bit SimHash of the token multiset. */
  def simhash(c: Column): Column = packVotes(simhashVotes(c))

  /** Hamming distance between two SimHash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into `bands` chunks
    * (pigeonhole: distance ≤ bands-1 ⇒ some chunk equal), equi-join on
    * chunks, verify with exact hamming distance. */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3,
      bands: Int = 4): DataFrame = {
    val bits = 64 / bands
    val sigs = df
      .select(col(idCol).as("id"), simhashVotes(col(textCol)).as("_votes"))
      .select(col("id"), packVotes(col("_votes")).as("sh"))
    val banded = sigs.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sh"), b * bits).bitwiseAND((1L << bits) - 1)): _*))
        .as(Seq("band", "chunk")))
    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }
}
