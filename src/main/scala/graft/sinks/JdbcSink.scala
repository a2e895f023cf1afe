package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.sql.{Connection, DriverManager}
import java.util.Properties

/** JDBC (Postgres-parity) sink — the reference's actual storage target
  * (`get_logs.go:95-137`): batched inserts with PK
  * `ON CONFLICT DO NOTHING` idempotence.
  *
  * Two paths behind one interface:
  * - [[appendOnConflictDoNothing]] — the Postgres-exact contract:
  *   per-partition prepared statements,
  *   `INSERT … ON CONFLICT (pk) DO NOTHING`, executeBatch every
  *   `batchSize` rows (the Spark rendering of the reference's single
  *   NamedExec per window, `get_logs.go:118-126`).
  * - [[appendIdempotent]] — dialect-generic: anti-join the batch
  *   against existing PKs (optionally range-pruned on `rangeCol`, the
  *   JDBC analog of the parquet sink's partition pruning), then plain
  *   batched append. Works on any JDBC database (integration-tested
  *   against embedded Derby).
  *
  * At scale the writes parallelize per partition; `rangeCol` keeps the
  * existing-keys read O(batch window), not O(table).
  */
object JdbcSink {

  /** Generic idempotent append (any JDBC dialect). */
  def appendIdempotent(
      batch: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      props: Properties = new Properties(),
      rangeCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(pk).cache()
    try {
      val existingAll = spark.read.jdbc(url, table, props)
      val existing = rangeCol match {
        case Some(c) =>
          val r = deduped.agg(min(col(c)), max(col(c))).collect()(0)
          if (r.isNullAt(0)) existingAll.limit(0)
          else existingAll.filter(col(c).between(r.get(0), r.get(1)))
        case None => existingAll
      }
      deduped
        .join(existing.select(pk.map(col): _*), pk, "left_anti")
        .write.mode("append").jdbc(url, table, props)
    } finally deduped.unpersist()
  }

  /** Postgres-exact idempotent append: `ON CONFLICT (pk) DO NOTHING`
    * executed as prepared-statement batches inside each partition. */
  def appendOnConflictDoNothing(
      batch: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      props: Properties = new Properties(),
      batchSize: Int = 1000): Unit = {
    val cols = batch.columns.toSeq
    val sql =
      s"""insert into $table (${cols.mkString(", ")})
         |values (${cols.map(_ => "?").mkString(", ")})
         |on conflict (${pk.mkString(", ")}) do nothing""".stripMargin
    val propsMap = {
      val m = new java.util.Properties()
      m.putAll(props)
      m
    }
    batch.dropDuplicates(pk).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn: Connection = DriverManager.getConnection(url, propsMap)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }

  /** Streaming variant: checkpointed micro-batches into the JDBC
    * table — the full reference loop with Postgres as the sink
    * (BASELINE.json's "Structured Streaming + Postgres sink"). */
  def streamTo(
      stream: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      checkpointDir: String,
      props: Properties = new Properties(),
      rangeCol: Option[String] = None,
      pollInterval: Option[String] = None): StreamingQuery = {
    val trigger = pollInterval
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, _: Long) =>
        appendIdempotent(b, url, table, pk, props, rangeCol)
      }
      .start()
  }
}
