package graft.tools

import graft.GraftSession
import graft.serving.Subscriptions
import graft.sources.{Logs, RpcSource}
import graft.streaming.LogStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** CLI: live-subscription serving — the reference's Postgraphile +
  * pg-pubsub live queries (`docker-compose.yaml:55,71-72`) as one
  * process: a streaming source (live JSON-RPC endpoint or a wire-shape
  * NDJSON drop directory) feeds the idempotent logs sink, and every
  * micro-batch fans out to SSE subscribers.
  *
  * Usage:
  *   runMain graft.tools.ServeSubscriptions <endpoint|inputDir> <tablePath> <checkpointDir> <port> [pollSeconds] [blockStep]
  *
  * `endpoint` starting with `http` streams from the live RPC source
  * (per-window parallel pulls); anything else is a drop directory of
  * `eth_getLogs`-shape NDJSON files. Subscribe with:
  *   curl -N localhost:<port>/subscribe -d \
  *     'subscription { Transfer_…(condition: {contract_address: "0x…"}) { from to amount } }'
  */
object ServeSubscriptions {
  def main(args: Array[String]): Unit = {
    val Array(source, table, ckpt, port) = args.take(4)
    val poll = args.lift(4).filterNot(_ == "-").getOrElse("2")
    val step = args.lift(5).getOrElse("100")
    val spark = GraftSession.get()
    val hub = new Subscriptions.Hub()
    val server = Subscriptions.serve(hub, port.toInt)
    println(s"[subscribe] http://localhost:${server.getAddress.getPort}/subscribe ready" +
      s" — views: logs, logs_canonical + ${graft.operators.EventViews.referenceViews.size} decoded")
    val q =
      if (source.startsWith("http"))
        spark.readStream.format(RpcSource.Format)
          .option("endpoint", source)
          .option("fromBlock", "1")
          .option("toBlock", Long.MaxValue.toString)
          .option("blockStep", step)
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime(s"$poll seconds"))
          .foreachBatch { (b: DataFrame, _: Long) =>
            Logs.appendIdempotent(b.sparkSession, b, table)
            hub.publish(b)
          }
          .start()
      else
        LogStream.ingest(spark, source, table, ckpt,
          pollInterval = Some(s"$poll seconds"), onBatch = hub.publish)
    try {
      while (q.isActive) {
        Thread.sleep(5000)
        println(s"[subscribe] subscribers=${hub.active} " +
          s"hwm=${Logs.highWaterMark(spark, table)}")
      }
    } finally {
      server.stop(0)
      spark.stop()
    }
  }
}
