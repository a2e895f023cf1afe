package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece
  * `model_type=unigram` algorithm), trained IN Spark: the second of
  * the two tokenizer families real pipelines ship, next to [[Bpe]].
  * A vocabulary of pieces with log-probabilities; encoding is the
  * Viterbi segmentation maximizing Σ log p; training is EM over the
  * segmentation lattice with periodic pruning.
  *
  * Training scale shape (the [[Bpe.trainMerges]] discipline): ONE
  * corpus pass builds the word-frequency histogram (explode →
  * combinable count, vocab-sized not corpus-sized); seeding is one
  * relational substring explosion over the histogram (positions
  * staged, no HOF-lambda trees); each EM iteration runs
  * forward–backward per UNIQUE word in `mapPartitions` with the
  * vocabulary broadcast, and the expected counts cross the shuffle
  * as one combinable sum per piece. Only vocab-sized tables ever
  * reach the driver (the PQ-codebook/centroid collect class). The
  * data-dependent DP per word is genuinely inexpressible as a
  * Catalyst expression at production vocab sizes — the same
  * justification as [[Bpe.encodeDocs]] and the codec paths.
  *
  * Coverage contract: every SINGLE character is always segmentable —
  * characters present in the corpus carry trained probabilities and
  * survive pruning unconditionally; characters never seen train
  * nothing and fall back to `charFloorLogp` at encode, so encoding
  * never fails. With a UNIFORM-logp vocabulary Viterbi degenerates
  * to fewest-pieces segmentation — a dictionary DP that DuckDB can
  * replay with a recursive CTE, which is what lets q99 gate the
  * lattice hash-exactly cross-engine (piece COUNT is unique even
  * where the argmax segmentation is tied).
  *
  * Deliberate boundaries vs SentencePiece, documented not hidden:
  * pruning keeps the top `vocabSize` pieces by trained probability
  * (SentencePiece prunes by per-piece likelihood LOSS, re-running EM
  * between shrink steps — the score ordering differs only in the
  * tail); words cap at [[MaxWordLen]] chars for the lattice (longer
  * words are split hard at the cap — normalizer-level guard, same
  * spirit as SentencePiece's max sentence length); no
  * subword-regularization sampling (deterministic Viterbi only).
  */
object Unigram {

  /** Lattice cap per word: forward–backward is O(len·maxPieceLen);
    * a pathological unbroken run (minified JS, DNA dumps) must not
    * quadratic-bomb an executor. 64 covers real words in any
    * language; beyond it the word hard-splits. */
  val MaxWordLen = 64

  /** Word-frequency histogram `(word, cnt)` — one combinable agg. */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(Text.normalized(col(textCol)).as("_n"))
      .select(explode(Text.tokens(col("_n"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Seed vocabulary: every substring of length 2..`maxPieceLen` of
    * the histogram words, scored by occurrence-weighted count × length
    * (the frequent-AND-long candidates EM then re-weights), top
    * `seedSize` kept with deterministic ties (score desc, piece asc);
    * all single characters join unconditionally. Relational: the
    * (pos, len) grid is staged with `sequence`+explode, the substring
    * count is one combinable agg over the histogram — no corpus
    * re-scan, no lambda-tree staging hazard. */
  def seedVocab(hist: DataFrame, seedSize: Int, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    val subs = hist
      .withColumn("_len", least(length(col("word")), lit(MaxWordLen)))
      .withColumn("_pos", explode(sequence(lit(1), col("_len"))))
      .withColumn("_pl", explode(sequence(lit(2), lit(maxPieceLen))))
      .filter(col("_pos") + col("_pl") - 1 <= col("_len"))
      .select(expr("substring(word, _pos, _pl)").as("piece"), col("cnt"))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).as("c"))
      .select(col("piece"), (col("c") * length(col("piece"))).as("score"))
      .orderBy(col("score").desc, col("piece"))
      .limit(seedSize)
    // single chars never collide with the length->=2 candidates: a
    // plain union is exact
    val chars = hist
      .withColumn("_len", least(length(col("word")), lit(MaxWordLen)))
      .withColumn("_pos", explode(sequence(lit(1), col("_len"))))
      .select(expr("substring(word, _pos, 1)").as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("score"))
    subs.unionByName(chars)
  }

  /** Forward–backward expected piece counts for one word (linear
    * domain — fine at [[MaxWordLen]]: the smallest path product is
    * ≫ Double.MinPositiveValue). Returns (piece, expectedCount·wcnt)
    * pairs, empty if the word has zero total lattice mass (cannot
    * happen when every char has a prob — enforced by training). */
  private[graft] def expectedCounts(
      word0: String, wcnt: Long, probs: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int, out: java.util.HashMap[String, Double]): Unit = {
    var base = 0
    while (base < word0.length) {
      val word = word0.substring(base, math.min(base + MaxWordLen, word0.length))
      val n = word.length
      val alpha = new Array[Double](n + 1)
      val beta = new Array[Double](n + 1)
      alpha(0) = 1.0
      var j = 1
      while (j <= n) {
        var l = 1
        var a = 0.0
        while (l <= maxPieceLen && l <= j) {
          val p = probs.get(word.substring(j - l, j))
          if (p != null) a += alpha(j - l) * p.doubleValue()
          l += 1
        }
        alpha(j) = a
        j += 1
      }
      val z = alpha(n)
      if (z > 0.0) {
        beta(n) = 1.0
        var i = n - 1
        while (i >= 0) {
          var l = 1
          var b = 0.0
          while (l <= maxPieceLen && i + l <= n) {
            val p = probs.get(word.substring(i, i + l))
            if (p != null) b += p.doubleValue() * beta(i + l)
            l += 1
          }
          beta(i) = b
          i -= 1
        }
        var s = 0
        while (s < n) {
          var l = 1
          while (l <= maxPieceLen && s + l <= n) {
            val piece = word.substring(s, s + l)
            val p = probs.get(piece)
            if (p != null) {
              val e = alpha(s) * p.doubleValue() * beta(s + l) / z * wcnt
              if (e > 0.0) out.put(piece, out.getOrDefault(piece, 0.0) + e)
            }
            l += 1
          }
          s += 1
        }
      }
      base += MaxWordLen
    }
  }

  /** One E-step over the histogram: expected piece counts under the
    * current probabilities. Broadcast vocab; combinable sum. */
  private def eStep(hist: DataFrame, probs: Map[String, Double],
      maxPieceLen: Int): Array[(String, Double)] = {
    val spark = hist.sparkSession
    val bc = spark.sparkContext.broadcast(probs)
    val rows = hist.select(col("word"), col("cnt"))
      .mapPartitions { it =>
        val pm = new java.util.HashMap[String, java.lang.Double]()
        bc.value.foreach { case (k, v) => pm.put(k, v) }
        val acc = new java.util.HashMap[String, Double]()
        it.foreach { r => expectedCounts(r.getString(0), r.getLong(1), pm, maxPieceLen, acc) }
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        acc.forEach((k, v) => b += ((k, v)))
        b.iterator
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaDouble))
      .toDF("piece", "e")
      .groupBy(col("piece")).agg(sum(col("e")).as("e"))
      .collect() // vocab-sized by contract
    rows.map(r => (r.getString(0), r.getDouble(1)))
  }

  /** Train a unigram vocabulary: seed → `emIters` EM rounds → prune
    * to `vocabSize` (single characters always survive) → `emIters`
    * more rounds to re-normalize the survivors. Returns
    * `(piece, logp)` in deterministic order (logp desc, piece asc). */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 4096, maxPieceLen: Int = 8, emIters: Int = 3): Seq[(String, Double)] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    trainFromHistogram(wordHistogram(df, textCol), vocabSize, seedSize,
      maxPieceLen, emIters)
  }

  /** [[train]] over a precomputed [[wordHistogram]] — the form a
    * 100 TB pipeline calls (histogram once, experiments many). */
  def trainFromHistogram(hist: DataFrame, vocabSize: Int,
      seedSize: Int = 4096, maxPieceLen: Int = 8, emIters: Int = 3): Seq[(String, Double)] = {
    val seed = seedVocab(hist, seedSize, maxPieceLen).collect() // vocab-sized
    val total = seed.map(r => r.getLong(1).toDouble).sum
    var probs: Map[String, Double] =
      seed.map(r => r.getString(0) -> r.getLong(1).toDouble / total).toMap
    val isChar = (p: String) => p.codePointCount(0, p.length) == 1
    def emRounds(k: Int): Unit = {
      var it = 0
      while (it < k) {
        val e = eStep(hist, probs, maxPieceLen)
        val z = e.map(_._2).sum
        if (z > 0.0) probs = e.map { case (p, c) => p -> c / z }.toMap
        it += 1
      }
    }
    emRounds(emIters)
    // prune: top vocabSize by prob (desc, piece asc); chars immune
    val kept = probs.toSeq.sortBy { case (p, pr) => (-pr, p) }
    val multi = kept.filter(p => !isChar(p._1)).take(
      math.max(0, vocabSize - kept.count(p => isChar(p._1))))
    probs = (kept.filter(p => isChar(p._1)) ++ multi).toMap
    emRounds(emIters)
    probs.toSeq.map { case (p, pr) => (p, math.log(pr)) }
      .sortBy { case (p, lp) => (-lp, p) }
  }

  /** Viterbi segmentation of one word: maximize Σ logp over vocab
    * pieces, every single char additionally available at
    * `charFloor`. Deterministic ties: higher score, then LONGER
    * last piece, then lexicographically smaller piece. */
  private[graft] def viterbiWord(word0: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int, charFloor: Double): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var base = 0
    while (base < word0.length) {
      val word = word0.substring(base, math.min(base + MaxWordLen, word0.length))
      val n = word.length
      val score = new Array[Double](n + 1)
      val from = new Array[Int](n + 1)
      val pick = new Array[String](n + 1)
      java.util.Arrays.fill(score, Double.NegativeInfinity)
      score(0) = 0.0
      var j = 1
      while (j <= n) {
        var l = 1
        while (l <= maxPieceLen && l <= j) {
          val piece = word.substring(j - l, j)
          val pv = vocab.get(piece)
          val lp =
            if (pv != null) pv.doubleValue()
            else if (l == 1) charFloor
            else Double.NegativeInfinity
          if (lp != Double.NegativeInfinity && score(j - l) != Double.NegativeInfinity) {
            val s = score(j - l) + lp
            val better = s > score(j) ||
              (s == score(j) && (pick(j) == null ||
                piece.length > pick(j).length ||
                (piece.length == pick(j).length && piece < pick(j))))
            if (better) { score(j) = s; from(j) = j - l; pick(j) = piece }
          }
          l += 1
        }
        j += 1
      }
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      var at = n
      while (at > 0) { rev += pick(at); at = from(at) }
      out ++= rev.reverse
      base += MaxWordLen
    }
    out.toArray
  }

  /** Production encode (the [[Bpe.encodeDocs]] shape): append
    * `outCol` = the Viterbi piece array of the document's words in
    * order. Vocabulary broadcast once; per-partition word cache;
    * null text → null. */
  def encodeDocs(df: DataFrame, textCol: String, vocab: Seq[(String, Double)],
      charFloor: Double = math.log(1e-9), outCol: String = "unigram_pieces",
      maxPieceLen: Int = 8, cacheCap: Int = 1 << 20): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toArray)
    val pre = df.withColumn("_ug_w",
      when(col(textCol).isNull, lit(null).cast(ArrayType(StringType)))
        .otherwise(Text.tokens(Text.normalized(col(textCol)))))
    val outSchema = pre.schema.add(outCol, ArrayType(StringType))
    val wIdx = pre.schema.fieldIndex("_ug_w")
    pre.mapPartitions { rows =>
      val vm = new java.util.HashMap[String, java.lang.Double]()
      bc.value.foreach { case (k, v) => vm.put(k, v) }
      val cache = new java.util.HashMap[String, Array[String]]()
      rows.map { r =>
        val out: Seq[String] =
          if (r.isNullAt(wIdx)) null
          else r.getSeq[String](wIdx).iterator.flatMap { w =>
            var enc = cache.get(w)
            if (enc == null) {
              enc = viterbiWord(w, vm, maxPieceLen, charFloor)
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            enc
          }.toSeq
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
      .drop("_ug_w")
  }

  /** Production encode to TOKEN IDS: [[encodeDocs]] emitting each
    * piece's INDEX in the given vocab order instead of its string —
    * persist the artifact ([[saveVocab]]) and that order IS the id
    * map, so the trainer's id space is reproducible from the file.
    * Fallback single chars absent from the vocabulary take the one
    * shared `unkId = vocab.size` (the usual UNK convention). The
    * id arrays feed [[graft.functions.Int32Le]] for `.bin`-style
    * binary export (q104). */
  def encodeDocsIds(df: DataFrame, textCol: String, vocab: Seq[(String, Double)],
      charFloor: Double = math.log(1e-9), outCol: String = "token_ids",
      maxPieceLen: Int = 8, cacheCap: Int = 1 << 20): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toArray)
    val pre = df.withColumn("_ug_w",
      when(col(textCol).isNull, lit(null).cast(ArrayType(StringType)))
        .otherwise(Text.tokens(Text.normalized(col(textCol)))))
    val outSchema = pre.schema.add(outCol, ArrayType(IntegerType))
    val wIdx = pre.schema.fieldIndex("_ug_w")
    pre.mapPartitions { rows =>
      val varr = bc.value
      val vm = new java.util.HashMap[String, java.lang.Double]()
      val idx = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < varr.length) {
        vm.put(varr(i)._1, varr(i)._2)
        idx.put(varr(i)._1, i)
        i += 1
      }
      val unkId = varr.length
      val cache = new java.util.HashMap[String, Array[Int]]()
      rows.map { r =>
        val out: Seq[Int] =
          if (r.isNullAt(wIdx)) null
          else r.getSeq[String](wIdx).iterator.flatMap { w =>
            var enc = cache.get(w)
            if (enc == null) {
              enc = viterbiWord(w, vm, maxPieceLen, charFloor).map { p =>
                val id = idx.get(p)
                if (id == null) unkId else id.intValue()
              }
              if (cache.size < cacheCap) cache.put(w, enc)
            }
            enc
          }.toSeq
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
      .drop("_ug_w")
  }

  /** Persist a trained vocabulary as the `(piece, logp)` parquet
    * artifact (the `.model` analog — vocab-sized). */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[(String, Double)], path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "logp").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveVocab]] artifact, deterministic order restored. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, Double)] =
    spark.read.parquet(path).orderBy(col("logp").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
}
