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
  *   against existing PKs (range-pruned on `rangeCol`, the JDBC analog
  *   of the parquet sink's partition pruning), then plain batched
  *   append. Works on any JDBC database (integration-tested against
  *   embedded Derby).
  *
  * At scale the writes parallelize per partition; `rangeCol` keeps the
  * existing-keys read O(batch window), not O(table): the bound is
  * baked into the pushed-down SQL itself ([[boundedKeysQuery]]), so a
  * micro-batch never rescans the whole target table. The streaming
  * path ([[streamTo]]) therefore REQUIRES a range column; only the
  * one-shot batch form may omit it (explicit full-table compare).
  */
object JdbcSink {

  /** The DB-side existing-keys probe: PK columns of the rows whose
    * `rangeCol` falls inside the batch's [lo, hi]. Sent as a derived
    * table, so the range predicate executes in the database by
    * construction (no reliance on filter pushdown) and only PK columns
    * cross the wire. */
  def boundedKeysQuery(table: String, pk: Seq[String], rangeCol: String,
      lo: Any, hi: Any): String =
    s"(select ${pk.mkString(", ")} from $table " +
      s"where $rangeCol between ${sqlLiteral(lo)} and ${sqlLiteral(hi)}) graft_existing_keys"

  private def sqlLiteral(v: Any): String = v match {
    case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) => n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp => s"timestamp '${t.toString}'"
    case d: java.sql.Date => s"date '${d.toString}'"
    case other => throw new IllegalArgumentException(
      s"rangeCol literal of unsupported type ${other.getClass.getName}")
  }

  /** `rangeCol` values are spliced into the pushed-down SQL as
    * literals ([[boundedKeysQuery]]), so only types whose rendering
    * cannot smuggle SQL are allowed: numerics, decimal, timestamp,
    * date. A string range column is rejected up front — quote-doubling
    * does not cover backslash-escaping dialects, so data-derived
    * string bounds would be an injection surface. */
  private def requireSpliceSafe(batch: DataFrame, rangeCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = batch.schema(rangeCol).dataType
    val ok = dt match {
      case _: NumericType | TimestampType | DateType => true
      case _ => false
    }
    require(ok, s"rangeCol '$rangeCol' must be numeric, timestamp or date " +
      s"(got $dt): string bounds would splice data into SQL text")
  }

  /** Generic idempotent append (any JDBC dialect). `rangeCol = None`
    * compares against the FULL target PK set — O(table) per call, for
    * one-shot batch loads only; every recurring path must pass the
    * range column. */
  def appendIdempotent(
      batch: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      props: Properties = new Properties(),
      rangeCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    rangeCol.foreach(requireSpliceSafe(batch, _))
    val deduped = batch.dropDuplicates(pk).cache()
    try {
      val existing = rangeCol match {
        case Some(c) =>
          val r = deduped.agg(min(col(c)), max(col(c))).collect()(0)
          if (r.isNullAt(0)) spark.read.jdbc(url, table, props).select(pk.map(col): _*).limit(0)
          else spark.read.jdbc(url, boundedKeysQuery(table, pk, c, r.get(0), r.get(1)), props)
        case None =>
          spark.read.jdbc(url, s"(select ${pk.mkString(", ")} from $table) graft_existing_keys", props)
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
    * (BASELINE.json's "Structured Streaming + Postgres sink").
    * `rangeCol` is REQUIRED here: a micro-batch loop doing a
    * full-table existing-keys read per batch degrades O(table²) over
    * the stream's lifetime. */
  def streamTo(
      stream: DataFrame,
      url: String,
      table: String,
      pk: Seq[String],
      checkpointDir: String,
      rangeCol: String,
      props: Properties = new Properties(),
      pollInterval: Option[String] = None): StreamingQuery = {
    val trigger = pollInterval
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, _: Long) =>
        appendIdempotent(b, url, table, pk, props, Some(rangeCol))
      }
      .start()
  }
}
