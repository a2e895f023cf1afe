package graft.streaming

import graft.sources.Logs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming rendering of the reference's ingestion loop
  * (`main.go:200-242`) and its streaming semantics (SURVEY §2.10).
  *
  * Mapping:
  * - T1 micro-batch windowing: the reference's fixed `blockStep`
  *   tumbling block window ↔ one micro-batch per trigger;
  *   `maxFilesPerTrigger` is the blockStep analog for file replay.
  * - T2 tail-follow + backpressure: `Trigger.ProcessingTime(sleep)` ↔
  *   the poll-sleep loop (`main.go:221-233`).
  * - T3 resume/exactly-once: checkpointed source offsets replace the
  *   DB high-water-mark scan, and the idempotent PK append
  *   ([[Logs.appendIdempotent]]) replaces `ON CONFLICT DO NOTHING` —
  *   the same two-layer at-least-once-delivery/exactly-once-effect
  *   contract (`main.go:206-215`, `get_logs.go:120`).
  * - T4 reorg/late data: watermarked streaming dedup; tombstones
  *   resolve through [[Logs.canonical]] on read.
  * - T5 bounded vs infinite: `Trigger.AvailableNow` ↔ `TO_BLOCK` set,
  *   `ProcessingTime` ↔ unset (`main.go:60-68`).
  *
  * A live `eth_getLogs` source would slot in as a DataSourceV2 with
  * address/block-range pushdown (SURVEY §4); file replay exercises the
  * identical downstream plan.
  */
object LogStream {

  /** Stream NDJSON RPC captures from `inputDir` into the logs table.
    *
    * @param maxFilesPerTrigger blockStep analog: bound work per batch
    * @param pollInterval       None → bounded catch-up (AvailableNow);
    *                           Some(d) → tail-follow with that trigger
    */
  def ingest(
      spark: SparkSession,
      inputDir: String,
      tablePath: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      pollInterval: Option[String] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(Logs.wireSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    val trigger = pollInterval
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    Logs.fromWire(raw).writeStream
      .queryName("graft_logs_ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // replayed batches re-run on failure → the PK anti-join makes
        // the append idempotent (exactly-once effect)
        Logs.appendIdempotent(batch.sparkSession, batch, tablePath)
      }
      .start()
  }

  /** T6: watermarked tumbling-window aggregation over an event stream
    * (append mode — windows finalize when the watermark passes). */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      windowLength: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** T4: streaming dedup on the PK within the watermark horizon — the
    * state-bounded form of the idempotence contract for sinks that
    * can't anti-join (e.g. append-only JDBC). */
  def dedupStream(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark).dropDuplicates(keys)
}
