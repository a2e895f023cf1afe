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
    * order. m merges = m chained codegen'd string ops per row. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (s, (a, b)) =>
      replace(s, lit(s" $a $b "), lit(s" $a$b "))
    }

  /** Encoded symbol array of a text column under a merge list. */
  def encode(c: Column, merges: Seq[(String, String)]): Column = {
    val done = applyMerges(spacedSymbols(c), merges)
    filter(split(trim(done), " "), t => length(t) > 0)
  }

  /** Subword token count under a merge list (excludes `</w>`). */
  def tokenCount(c: Column, merges: Seq[(String, String)]): Column =
    size(filter(encode(c, merges), t => t =!= "</w>"))

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
          vocab = vocab
            .select(replace(col("sym"), lit(s" $a $b "), lit(s" $a$b ")).as("sym"),
              col("cnt"))
            .localCheckpoint(true) // truncate the per-round lineage
          round += 1
        case None => continue = false
      }
    }
    merges.toSeq
  }
}
