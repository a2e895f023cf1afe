package graft.tools

import graft.GraftSession
import graft.sources.Logs
import graft.streaming.LogStream

/** CLI: continuous ingestion — the unbounded mode of the reference's
  * poll loop (`main.go:217-241`). Watches `inputDir` for NDJSON
  * captures, micro-batches them into the logs table idempotently,
  * checkpointing for resume. Bounded catch-up mode when no poll
  * interval is given (the `TO_BLOCK`-set analog).
  *
  * Usage: runMain graft.tools.StreamLogs <inputDir> <tablePath> <checkpointDir> [pollSeconds]
  */
object StreamLogs {
  def main(args: Array[String]): Unit = {
    val Array(in, table, ckpt) = args.take(3)
    val poll = args.lift(3).map(s => s"$s seconds")
    val spark = GraftSession.get()
    val q = LogStream.ingest(spark, in, table, ckpt, pollInterval = poll)
    println(s"[stream] mode=${poll.map(p => s"tail-follow/$p").getOrElse("catch-up")} " +
      s"table=$table checkpoint=$ckpt")
    poll match {
      case Some(_) =>
        // tail-follow: report progress until externally stopped
        while (q.isActive) {
          Thread.sleep(5000)
          println(s"[stream] rows=${Logs.read(spark, table).count()} " +
            s"hwm=${Logs.highWaterMark(spark, table)}")
        }
      case None =>
        q.awaitTermination()
        println(s"[stream] caught up: rows=${Logs.read(spark, table).count()} " +
          s"hwm=${Logs.highWaterMark(spark, table)}")
    }
    spark.stop()
  }
}
