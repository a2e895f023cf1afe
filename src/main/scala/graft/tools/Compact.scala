package graft.tools

import graft.GraftSession
import graft.sources.Logs

/** CLI: compact the logs table's micro-batch file fragments (run
  * periodically beside a streaming ingest).
  *
  * Usage: runMain graft.tools.Compact <tablePath> [blockRange...]
  */
object Compact {
  def main(args: Array[String]): Unit = {
    val table = args(0)
    val ranges = if (args.length > 1) Some(args.drop(1).map(_.toLong).toSeq) else None
    val spark = GraftSession.get()
    val before = Logs.read(spark, table).count()
    Logs.compact(spark, table, ranges)
    println(s"[compact] rows before=$before after=${Logs.read(spark, table).count()}")
    spark.stop()
  }
}
