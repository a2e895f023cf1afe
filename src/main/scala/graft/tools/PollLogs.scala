package graft.tools

import graft.GraftSession
import graft.sources.{Logs, Rpc}

/** CLI: the LIVE ingestion loop — poll an EVM JSON-RPC endpoint for
  * logs exactly like the reference binary (`main.go:200-242`): head
  * probe, tumbling block windows, retry/backoff, high-water-mark
  * resume, idempotent append.
  *
  * Usage: runMain graft.tools.PollLogs <endpoint> <table> [toBlock] [blockStep] [contractsCsv] [rescanDepth]
  */
object PollLogs {
  def main(args: Array[String]): Unit = {
    val Array(endpoint, table) = args.take(2)
    val cfg = Rpc.Config(
      endpoint,
      contracts = args.lift(4).filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq.empty),
      toBlock = args.lift(2).map(_.toLong),
      blockStep = args.lift(3).map(_.toLong).getOrElse(100L),
      rescanDepth = args.lift(5).map(_.toLong).getOrElse(0L))
    val spark = GraftSession.get()
    println(s"[poll] endpoint=$endpoint resume=${Logs.highWaterMark(spark, table)} " +
      s"toBlock=${cfg.toBlock.getOrElse("∞")} step=${cfg.blockStep} rescan=${cfg.rescanDepth}")
    val last = Rpc.ingestLoop(spark, cfg, table)
    println(s"[poll] done lastBlock=$last rows=${Logs.read(spark, table).count()} " +
      s"hwm=${Logs.highWaterMark(spark, table)}")
    spark.stop()
  }
}
