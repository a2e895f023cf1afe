package graft.tools

import graft.GraftSession
import graft.functions.Text
import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CLI: corpus data-quality profile — the q75 composition plus the
  * rows-only signals, per shard, from a documents parquet:
  * docs/tokens, language-ID agreement, unique-fingerprint count, mean
  * quality, mean bigram-duplication, mean deflate ratio, PII density,
  * and duplicated-span coverage. One terminal table + a parquet dump
  * (`<out>` optional) — the "should I train on this" report.
  *
  * Usage: runMain graft.tools.ProfileCorpus <documentsParquet> [shardCol] [outParquet]
  */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val shard = args.lift(1).getOrElse("source")
    val out = args.lift(2)
    val spark = GraftSession.get()

    val docs = spark.read.parquet(in)
    require(docs.columns.contains(shard), s"no shard column '$shard' in $in")

    val staged = Text.withPiiSignals(Text.withLangId(docs, "text"), "text")
      .select(col("doc_id"), col(shard).as("shard"),
        col("lang"), col("lang_guess"),
        Text.qualityScore(col("text")).as("q"),
        Text.tokenCount(col("text")).cast(LongType).as("ntok"),
        Text.fingerprint(col("text")).as("fp"),
        Text.compressionRatio(col("text")).as("deflate"),
        (col("n_emails") + col("n_ips") + col("n_phones")).cast(LongType).as("pii"))
    val rep = Corpus.repetitionSignals(docs, "doc_id", "text", n = 2)
      .select(col("id").as("doc_id"), col("dup_gram_frac"))
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", w = 3)
      .select(col("id").as("doc_id"), col("dup_token_frac"))

    val profile = staged
      .join(rep, Seq("doc_id"), "left")
      .join(spans, Seq("doc_id"), "left")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        sum(when(col("lang_guess") === col("lang"), 1L).otherwise(0L)).as("n_lang_match"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("pii")).as("n_pii"),
        avg(col("q")).as("avg_quality"),
        avg(col("deflate")).as("avg_deflate_ratio"),
        avg(coalesce(col("dup_gram_frac"), lit(0.0))).as("avg_dup_gram_frac"),
        avg(coalesce(col("dup_token_frac"), lit(0.0))).as("avg_dup_span_frac"))
      .orderBy(col("shard"))

    // the profile is shard-sized (tiny) but its PLAN scans the corpus
    // several times (langid/PII staging, repetition aggs, span census,
    // deflate) — evaluate once, serve show/write/summary from the pin
    val pinned = profile.localCheckpoint(true)
    pinned.show(1000, truncate = false)
    out.foreach(o => pinned.write.mode("overwrite").parquet(o))
    val (nShards, nDocs) = pinned
      .agg(count(lit(1)), coalesce(sum(col("n_docs")), lit(0L))).collect()(0) match {
        case r => (r.getLong(0), r.getLong(1))
      }
    println(s"[profile] shards=$nShards docs=$nDocs " +
      s"shardCol=$shard${out.map(o => s" → $o").getOrElse("")}")
    spark.stop()
  }
}
