package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming document curation: the batch LLM-pipeline tier
  * (quality → PII scan → exact dedup) as a Structured Streaming
  * pipeline, for corpora that arrive continuously (crawl drops,
  * ingestion feeds) instead of as a frozen snapshot.
  *
  * Semantics:
  * - quality/language/PII columns are pure projections (the same
  *   codegen'd expressions as the batch path — no divergence between
  *   the streaming and batch scores);
  * - exact dedup is `dropDuplicates` on the content fingerprint:
  *   cross-BATCH state in the state store, so a duplicate arriving in
  *   a later micro-batch (or after a crash-restart on the same
  *   checkpoint) is still dropped — the streaming analog of
  *   [[graft.operators.Dedup.exact]];
  * - with `watermarkCol` set, [[dropDuplicatesWithinWatermark]]
  *   bounds the dedup state: duplicates are only guaranteed dropped
  *   within the watermark delay, and state older than the watermark
  *   is evicted — the 100 TB-stream setting, where unbounded
  *   fingerprint state would grow with the corpus. Unset, state is
  *   exact-forever (bounded corpora, backfills).
  *
  * Scale shape: everything before the dedup is map-side; the dedup
  * shuffles (fingerprint-keyed) once per micro-batch and its state
  * store holds one fingerprint per surviving doc (md5 → 16 bytes +
  * key overhead), partitioned across executors.
  */
object DocStream {

  /** Input schema of the document stream (the `documents` fixture
    * shape plus an optional event-time column for watermarking). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The curated stream: quality-filtered, PII-annotated,
    * fingerprint-deduplicated documents.
    *
    * @param dedupWatermark None → exact-forever dedup state;
    *                       Some((tsCol, delay)) → watermarked state
    *                       ([[org.apache.spark.sql.Dataset.dropDuplicatesWithinWatermark]]),
    *                       the bounded-state form for endless streams
    *                       (`tsCol` must exist in `schema`) */
  def curatedStream(
      spark: SparkSession,
      inputDir: String,
      minQuality: Double = 0.2,
      maxFilesPerTrigger: Int = 100,
      schema: StructType = docSchema,
      dedupWatermark: Option[(String, String)] = None): DataFrame = {
    val in = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    val scored = Text.withPiiSignals(
        in.withColumn("quality", Text.qualityScore(col("text")))
          .filter(col("quality") >= minQuality), "text")
      .withColumn("fp", Text.fingerprint(col("text")))
    dedupWatermark match {
      case Some((tsCol, delay)) =>
        scored.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("fp")
      case None => scored.dropDuplicates("fp")
    }
  }

  /** Run the curation to parquet with checkpointed exactly-once file
    * output. `pollInterval` None → drain-and-stop (AvailableNow). */
  def curate(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      minQuality: Double = 0.2,
      maxFilesPerTrigger: Int = 100,
      pollInterval: Option[String] = None): StreamingQuery = {
    val trigger = pollInterval
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    curatedStream(spark, inputDir, minQuality, maxFilesPerTrigger)
      .writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
