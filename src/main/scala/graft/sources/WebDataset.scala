package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sample-level view over tar shards — what a WebDataset loader
  * actually feeds a trainer: the member FILES `<key>.txt`,
  * `<key>.json`, `<key>.bin` regrouped into one row per key with an
  * `ext → payload` map.
  *
  * Two grouping strategies, chosen by whether the shards honor the
  * WebDataset adjacency contract (a sample's members stored
  * consecutively — [[graft.sinks.TarShards.writeMembers]] guarantees
  * it by sorting members (key, ext) within a shard):
  * - `sorted = true` (default): ZERO-SHUFFLE grouping. Each shard is
  *   one partition ([[TarSource]]); adjacent runs of equal keys fold
  *   into samples inside `mapPartitions`. At 100 TB this moves no
  *   payload bytes at all — grouping work is a streaming fold over
  *   each task's own tar. A key spanning a partition boundary cannot
  *   exist under the contract (members of a key share a shard), so
  *   the fold is exact; shards from FOREIGN writers that interleave
  *   keys would produce split samples — use `sorted = false` there.
  * - `sorted = false`: one `groupBy(key)` shuffle — order-agnostic,
  *   correct for any tar layout, costs a full payload shuffle.
  *
  * Output: `(key, n_parts, bytes, parts: map<string,binary>)`.
  * `mapPartitions` (not an operator chain) is justified here by the
  * genuinely per-partition imperative contract: "adjacent run"
  * is a property of the tar's byte order, which no relational
  * operator can see without the shuffle we're avoiding. */
object WebDataset {

  def samples(spark: SparkSession, path: String, sorted: Boolean = true): DataFrame = {
    val members = spark.read.format("graft.sources.TarSource")
      .option("path", path).load()
    if (sorted) {
      import spark.implicits._
      val typed = members.select(col("key"), col("ext"), col("payload"))
        .as(Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.BINARY))
      val grouped = typed.mapPartitions { it =>
        new Iterator[(String, Map[String, Array[Byte]])] {
          private var pending: Option[(String, String, Array[Byte])] = None
          def hasNext: Boolean = pending.isDefined || it.hasNext
          def next(): (String, Map[String, Array[Byte]]) = {
            val head = pending.getOrElse(it.next())
            pending = None
            val key = head._1
            val parts = scala.collection.mutable.LinkedHashMap[String, Array[Byte]](
              head._2 -> head._3)
            var done = false
            while (!done && it.hasNext) {
              val n = it.next()
              if (n._1 == key) {
                // a foreign tar can repeat an ext within one key's
                // run; last-wins would silently drop the first
                // payload AND undercount n_parts — refuse loudly
                // (writeMembers-produced shards can't produce this)
                require(!parts.contains(n._2),
                  s"duplicate member ext '${n._2}' for sample key '$key' — " +
                    "not a valid WebDataset sample")
                parts += (n._2 -> n._3)
              } else { pending = Some(n); done = true }
            }
            (key, parts.toMap)
          }
        }
      }
      grouped.toDF("key", "parts")
        .select(col("key"),
          size(map_keys(col("parts"))).as("n_parts"),
          aggregate(map_values(col("parts")), lit(0L),
            (acc, p) => acc + length(p)).as("bytes"),
          col("parts"))
    } else {
      members
        .groupBy(col("key"))
        .agg(
          count(lit(1)).cast(IntegerType).as("n_parts"),
          sum(length(col("payload"))).as("bytes"),
          map_from_entries(sort_array(collect_list(
            struct(col("ext"), col("payload"))))).as("parts"))
        .select(col("key"), col("n_parts"), col("bytes"), col("parts"))
    }
  }
}
