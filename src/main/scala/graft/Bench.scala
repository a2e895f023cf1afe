package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, evaluated through the noop sink (count() would
  * let Catalyst prune the work under test). Each query runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the PER-QUERY
  * MEDIAN — a one-off GC/JIT spike in a single run can no longer
  * masquerade as a plan regression in the round artifact (r2's q17
  * "6× regression" was exactly that). `value` = sum of medians;
  * `wall` = actual wall-clock spent, all runs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val s0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - s0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","runs":$runs,"wall":$wall}""")
    spark.stop()
  }
}
