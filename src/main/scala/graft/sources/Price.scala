package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `price` dimension: token USD price as-of block
  * (`schema.sql:68-81`; ingest via `eth_call` on a Chainlink oracle,
  * `get_price.go:31-50`). PK `(address, block_number)`; price is
  * USD × 1e8 stored integral (`schema.sql:78-81`, Go uint64
  * `get_price.go:20`).
  *
  * Slowly-growing keyed table: small enough to broadcast in most
  * joins; the as-of lookup against `logs` is
  * [[graft.operators.AsOfJoin]].
  */
object Price {

  val schema: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("block_number", LongType),
    StructField("price", DecimalType(38, 0))))

  val pk: Seq[String] = Seq("address", "block_number")

  /** S6: idempotent append, PK DO-NOTHING semantics
    * (`get_price.go:96`). Dimension-sized table — plain anti-join. */
  def appendIdempotent(spark: SparkSession, batch: DataFrame, tablePath: String): Unit = {
    val deduped = batch.dropDuplicates(pk)
    val fresh =
      if (Logs.tableExists(spark, tablePath))
        deduped.join(spark.read.parquet(tablePath).select(pk.map(col): _*), pk, "left_anti")
      else deduped
    fresh.write.mode("append").parquet(tablePath)
  }
}
