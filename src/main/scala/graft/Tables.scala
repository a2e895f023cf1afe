package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table loader (TESTDATA.md: one parquet per table). */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** Loads a table; `events.ts` is stored as TIMESTAMP(NANOS), which we
    * read via nanosAsLong and truncate to micros (exactly what DuckDB's
    * reader does, keeping oracle parity). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
