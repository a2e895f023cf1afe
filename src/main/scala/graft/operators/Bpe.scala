package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer, trained IN Spark and applied as pure
  * expressions — upgrading the regex "BPE-ish" token proxy
  * ([[graft.functions.Text.bpeishTokenCount]]) to a real trainable
  * subword vocabulary (Sennrich et al. 2016 re-expressed).
  *
  * Representation: a document becomes one spaced-symbol string
  * `" c a t </w> d o g </w> "` — every symbol framed by single
  * spaces, `</w>` closing each word. A merge `(a, b) → ab` is then
  * the LITERAL string replace `" a b " → " ab "`, which both Java and
  * DuckDB execute with identical left-to-right non-overlapping scans
  * — so an encode under a fixed merge list is hash-gateable
  * cross-engine (this is also how Sennrich's reference script applies
  * merges: pattern replace over spaced symbols). Two exactness
  * quirks, deterministic and engine-identical: adjacent occurrences
  * sharing a boundary space resolve left-to-right (the consumed
  * separator hides the second), and merges apply in LIST order, each
  * globally, rather than per-word priority queues. Cross-word false
  * matches cannot happen: every learned pair is intra-word, and
  * between words the `</w>` symbol breaks any `" a b "` pattern.
  *
  * Training scale shape: ONE corpus pass builds the word-frequency
  * histogram (explode → combinable count, vocab-sized not
  * corpus-sized); each of the `numMerges` rounds then runs on the
  * histogram only — explode adjacent symbol pairs, one combinable
  * weighted count, take the argmax to the driver (a single row), and
  * apply that merge to the histogram's symbol column. Exactly the
  * classic BPE trainer, with the vocab histogram in the cluster
  * instead of a python dict.
  */
object Bpe {

  /** The spaced-symbol form of a document: normalize → every char
    * framed by spaces → word gaps become `</w>` symbols → trailing
    * `</w>`. Pure expression composition (no HOFs — the per-char
    * expansion is one global regexp_replace). */
  def spacedSymbols(c: Column): Column = {
    val n = Text.normalized(c)
    val expanded = regexp_replace(n, "(.)", "$1 ") // "cat dog" → "c a t    d o g "
    when(length(n) === 0, lit(""))
      .otherwise(concat(lit(" "),
        replace(expanded, lit("   "), lit(" </w> ")), lit("</w> ")))
  }

  /** Apply a merge list (training output, or any fixed vocabulary) to
    * a spaced-symbol column: one literal `replace` per merge, in list
    * order. m merges = m chained codegen'd string ops per row — a
    * SMALL-LIST device: at a production vocabulary (~32k merges) the
    * chained tree is 32k sequential string passes per row and melts
    * janino long before that (the `Similarity.pqScoredSubs` failure
    * class). Production encode is [[encodeDocs]]. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (s, (a, b)) =>
      replace(s, lit(s" $a $b "), lit(s" $a$b "))
    }

  /** Encoded symbol array of a text column under a merge list —
    * expression form; see [[applyMerges]] for its merge-count ceiling
    * and [[encodeDocs]] for the production path. */
  def encode(c: Column, merges: Seq[(String, String)]): Column = {
    val done = applyMerges(spacedSymbols(c), merges)
    filter(split(trim(done), " "), t => length(t) > 0)
  }

  private val EndOfWord = "</w>"

  /** One word → merged symbol array under rank-greedy BPE: repeatedly
    * merge ALL occurrences (left-to-right, non-overlapping) of the
    * lowest-rank adjacent pair present, until no adjacent pair is in
    * the table. O(len²) per word, INDEPENDENT of the merge count —
    * the property that makes a 32k-merge vocabulary usable.
    *
    * Equivalence (why this is "the same BPE" as applying the list in
    * order): merging pair r creates only pairs containing the new
    * symbol `ab`, and any learned pair containing `ab` was learned
    * AFTER r — so merging can never (re-)enable a lower-rank pair,
    * and rank-greedy order equals list order, each merge run to
    * fixpoint. One left-to-right pass with skip IS that fixpoint: a
    * new occurrence of the same pair would need `ab == a` or
    * `ab == b`, impossible for non-empty halves. This also means
    * adjacent repeats merge Sennrich-style ("a a a a" → "aa aa"),
    * where [[applyMerges]]' literal replace consumes the shared
    * boundary space and merges alternate occurrences (" aa a a ") —
    * the ONE documented divergence between the two forms. */
  private[graft] def encodeWord(
      word: String, rank: Map[(String, String), Int],
      merges: IndexedSeq[(String, String)]): Array[String] = {
    // split like the expression form's regexp "(.)": per code point
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      cur += word.substring(i, i + n)
      i += n
    }
    cur += EndOfWord
    var done = false
    while (!done && cur.length >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j < cur.length - 1) {
        val r = rank.getOrElse((cur(j), cur(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < cur.length) {
          if (k < cur.length - 1 && cur(k) == a && cur(k + 1) == b) {
            next += (a + b); k += 2
          } else { next += cur(k); k += 1 }
        }
        cur = next
      }
    }
    cur.toArray
  }

  /** Production encode: append `outCol` (array of merged symbols,
    * `</w>`-terminated words, concatenated in document order) to `df`.
    *
    * This is the loop path for real vocabularies: the merge table is
    * BROADCAST once (a 32k-pair map is a few MB), each partition
    * encodes words with [[encodeWord]] through a per-partition word
    * cache (corpora repeat words — each unique word pays its O(len²)
    * once per partition; the cache is capped so a pathological
    * high-cardinality partition degrades to per-occurrence work, not
    * OOM), and no expression tree ever sees the merge count — the
    * janino ceiling that bounds [[applyMerges]] does not exist here.
    * `mapPartitions` is justified the same way as the codec paths: a
    * data-dependent merge loop per row is genuinely inexpressible as
    * a Catalyst expression at production merge counts.
    *
    * Normalization/tokenization is staged as a COLUMN
    * (`Text.tokens(Text.normalized(...))`) before the partition map,
    * so the split semantics are identical-by-construction to the
    * expression form; output equals [[encode]] except the documented
    * adjacent-repeat case (see [[encodeWord]]), where this form is
    * the Sennrich-faithful one. Null text → null output. */
  def encodeDocs(
      df: DataFrame, textCol: String, merges: Seq[(String, String)],
      outCol: String = "bpe_symbols", cacheCap: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val mergeArr = merges.toIndexedSeq
    val bc = df.sparkSession.sparkContext.broadcast(
      (mergeArr, mergeArr.zipWithIndex.toMap))
    val pre = df.withColumn("_bpe_w",
      when(col(textCol).isNull, lit(null).cast(ArrayType(StringType)))
        .otherwise(Text.tokens(Text.normalized(col(textCol)))))
    val outSchema = pre.schema.add(outCol, ArrayType(StringType))
    val wIdx = pre.schema.fieldIndex("_bpe_w")
    pre.mapPartitions { rows =>
      val (ms, rank) = bc.value
      val cache = new java.util.HashMap[String, Array[String]]()
      rows.map { r =>
        val out: Seq[String] =
          if (r.isNullAt(wIdx)) null
          else r.getSeq[String](wIdx).iterator.flatMap { w =>
            var enc = cache.get(w)
            if (enc == null) {
              enc = encodeWord(w, rank, ms)
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            enc
          }.toSeq
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
      .drop("_bpe_w")
  }

  /** Subword token count under a merge list (excludes `</w>`). */
  def tokenCount(c: Column, merges: Seq[(String, String)]): Column =
    size(filter(encode(c, merges), t => t =!= "</w>"))

  /** Persist a trained merge list as a tiny parquet artifact
    * `(rank, a, b)` — the vocabulary hand-off between the training
    * job and every later encode job (the file a tokenizer release
    * ships). Vocab-sized, not corpus-sized: a 32k-merge list is a few
    * hundred KB. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge list saved by [[saveMerges]], application order
    * restored from `rank`. The collect is vocab-sized by contract
    * (same class as the PQ codebook / k-means centroid driver state). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Train `numMerges` BPE merges over a corpus column. Deterministic:
    * pair-count ties break lexicographically on the pair. Returns the
    * merge list in application order. Rounds run over the vocab
    * histogram; only the single argmax row reaches the driver per
    * round. `minPairCount` stops early when no pair is frequent
    * enough to matter. */
  def trainMerges(
      df: DataFrame, textCol: String,
      numMerges: Int, minPairCount: Long = 2L): Seq[(String, String)] = {
    val spark = df.sparkSession
    var vocab = df
      .select(explode(Text.tokens(Text.normalized(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
          regexp_replace(col("w"), "(.)", "$1 "), // "cat" → "c a t "
          lit("</w> ")).as("sym"),
        col("cnt"))
      .localCheckpoint(true) // pin the histogram; rounds re-read it
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < numMerges) {
      val top = vocab
        .select(col("cnt"), split(trim(col("sym")), " ").as("_s"))
        .select(col("cnt"), explode(Dedup.shinglesFromTokens(col("_s"), 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .head(1)
      top.headOption.filter(_.getLong(1) >= minPairCount) match {
        case Some(row) =>
          val parts = row.getString(0).split(" ", 2)
          val (a, b) = (parts(0), parts(1))
          merges += ((a, b))
          val prev = vocab
          vocab = vocab
            .select(replace(col("sym"), lit(s" $a $b "), lit(s" $a$b ")).as("sym"),
              col("cnt"))
            .localCheckpoint(true) // truncate the per-round lineage
          // the new checkpoint is eager (materialized above), so the
          // prior round's blocks are dead — free them, or a production
          // merge count (~30k rounds) pins thousands of histogram
          // copies in the block manager for the life of the session.
          // Must be RDD-level (Pins.release): Dataset.unpersist only
          // clears CacheManager entries and leaves checkpoint pins
          // untouched (see graft.Pins scaladoc).
          graft.Pins.release(prev)
          round += 1
        case None => continue = false
      }
    }
    graft.Pins.release(vocab) // release the final round's checkpoint too
    merges.toSeq
  }
}
