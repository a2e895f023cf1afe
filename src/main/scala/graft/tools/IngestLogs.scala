package graft.tools

import graft.GraftSession
import graft.operators.EventViews
import graft.sources.Logs

/** CLI: batch-replay an NDJSON `eth_getLogs` capture into the logs
  * table — the Spark rendering of the reference's ingestion loop E1
  * (`main.go:200-242`) in bounded/replay mode. Prints the resume
  * point, appends idempotently, re-prints the high-water mark, then
  * registers the generated event views and shows the Transfer view.
  *
  * Usage: runMain graft.tools.IngestLogs <ndjson-path> <table-path>
  */
object IngestLogs {
  def main(args: Array[String]): Unit = {
    val Array(ndjson, table) = args.take(2)
    val spark = GraftSession.get()

    val resumeFrom = Logs.highWaterMark(spark, table)
    println(s"[ingest] resume point (max block_number) = $resumeFrom")

    val batch = Logs.readNdjson(spark, ndjson)
    Logs.appendIdempotent(spark, batch, table)

    val stored = Logs.read(spark, table)
    println(s"[ingest] table rows = ${stored.count()}")
    println(s"[ingest] high-water mark = ${Logs.highWaterMark(spark, table)}")

    EventViews.registerAll(spark, Logs.canonical(stored))
    val transfers = spark.sql(
      "select `from`, `to`, amount, contract_address, evt_block_number " +
        "from Transfer_address_from_address_to_uint256_amount_d")
    transfers.show(20, truncate = false)
    spark.stop()
  }
}
