package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level statistics and sampling for training-data pipelines:
  * term/document frequencies, TF-IDF, and deterministic sampling.
  *
  * Scale shape: the TF/DF path is explode → hash-aggregate — the
  * fan-out is |tokens|× rows, but both aggregations are map-side
  * combinable, so what crosses the shuffle is (key, partial count),
  * not token instances. The IDF join shuffles on `term`; AQE
  * broadcasts the vocabulary side when it fits. Sampling comes in two
  * deterministic flavors: hash sampling (a filter — zero shuffle, the
  * 100 TB default) and systematic per-stratum sampling (one shuffle by
  * stratum for the row_number window — the exactly-reproducible,
  * SQL-expressible variant; a degenerate giant stratum serializes its
  * window sort, so prefer the hash sample when strata are skewed).
  */
object Corpus {

  /** Per-document term frequencies `(id, term, tf)` over whitespace
    * tokens of the normalized text. Normalize→tokenize is staged as
    * named columns (HOF-staging contract), the explode is map-side,
    * and the count is a hash aggregate with partial combine. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), Text.normalized(col(textCol)).as("_n"))
      .select(col("id"), Text.tokens(col("_n")).as("_toks"))
      .select(col("id"), explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary `(term, df, tf_total)`: document frequency and
    * total occurrences, derived from the TF table so the token
    * explosion happens once. */
  def vocabulary(tf: DataFrame): DataFrame =
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))

  /** TF-IDF over a precomputed TF table: `tf * log(nDocs / df)`.
    * Standard log-idf — the gated query (q58) scores with the exact
    * linear ratio `tf * nDocs / df` instead, because IEEE +,*,/ are
    * correctly rounded (bitwise-identical across engines) while `log`
    * is not; this keeps the oracle hash-exact and the spec checks the
    * log form against driver-computed values. */
  def tfidf(tf: DataFrame, nDocs: Long): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf").cast(DoubleType) *
          log(lit(nDocs.toDouble) / col("df").cast(DoubleType))).as("tfidf"))
  }

  /** Deterministic hash sample: keep the rows whose keyed xxhash64
    * lands under `fraction` of the hash space. A pure filter — no
    * shuffle, no state, reproducible across runs and engines that
    * share the hash, and monotone in `fraction` (a 20% sample is a
    * subset of the 50% sample at the same seed), which makes staged
    * experiments nested by construction. The 100 TB default. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int = 42): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Systematic per-stratum sample: every `every`-th row of each
    * stratum in `orderCol` order. Exactly reproducible and plain-SQL
    * expressible (the oracled variant); costs one shuffle by stratum
    * for the row_number window. */
  def systematicSample(df: DataFrame, strataCol: String, orderCol: String, every: Int): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(col(strataCol)).orderBy(col(orderCol))))
      .filter((col("_rn") - 1) % every === 0)
      .drop("_rn")
  }
}
