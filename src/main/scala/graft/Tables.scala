package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table loader (TESTDATA.md: one parquet per table). */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Loads a table, normalizing `events.ts` across testdata
    * generations to a session-zoned TIMESTAMP holding the same
    * instants DuckDB reads:
    *  - TIMESTAMP(NANOS) parquet (early rounds) arrives as Long via
    *    `nanosAsLong` and truncates to micros — exactly DuckDB's own
    *    nanos handling;
    *  - timestamp[us] with isAdjustedToUTC=false (r9 regeneration)
    *    arrives as TIMESTAMP_NTZ and casts to TIMESTAMP — a pure
    *    re-tag under the pinned UTC session timezone, preserving the
    *    stored micros verbatim.
    * Downstream code (streaming watermarks require TIMESTAMP, window
    * aggs, the q13/q45 oracle twins) then sees one type regardless of
    * which writer produced the fixture. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }
}
