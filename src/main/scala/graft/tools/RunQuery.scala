package graft.tools

import graft.{GraftSession, SparkEntry}

/** CLI: run one named SparkEntry query, print its physical plan,
  * wall time, and row count.
  *
  * Usage: runMain graft.tools.RunQuery <queryName> [sfDir] [explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save() // full evaluation
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[runquery] $name rows=${df.count()} sec=$sec%.2f")
    spark.stop()
  }
}
