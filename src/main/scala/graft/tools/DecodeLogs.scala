package graft.tools

import graft.GraftSession
import graft.functions.Abi
import org.apache.spark.sql.functions._

/** CLI: decode an NDJSON `eth_getLogs` capture and print the decoded
  * Transfer events — the Spark rendering of the reference's manual
  * curl+jq / psql inspection workflow
  * (`curl-get-logs-moonbeam-loop.sh`, `scratch.sql`).
  *
  * Usage: runMain graft.tools.DecodeLogs <ndjson-path>
  */
object DecodeLogs {
  val TransferSig = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val raw = spark.read.json(args(0))
    val logs = raw.select(
      col("address"),
      element_at(col("topics"), 1).as("topic0"),
      element_at(col("topics"), 2).as("topic1"),
      element_at(col("topics"), 3).as("topic2"),
      element_at(col("topics"), 4).as("topic3"),
      when(col("data").isin("0x", ""), lit(null)).otherwise(col("data")).as("data"),
      Abi.hexToLong(col("blockNumber")).as("block_number"))
    val decoded = logs
      .filter(col("topic0") === TransferSig)
      .select(
        Abi.toAddress(2, col("topic1")).as("from"),
        Abi.toAddress(2, col("topic2")).as("to"),
        Abi.toUint256(2, col("data")).as("value"),
        Abi.Ref.toUint256(2, col("data")).as("value_ref_compat"),
        col("address").as("contract_address"),
        col("block_number"))
    decoded.show(100, truncate = false)
    spark.stop()
  }
}
