package graft.tools

import graft.GraftSession
import graft.functions.Abi
import graft.operators.EventViews
import graft.sources.Logs

/** CLI: the analyst path (reference lifecycle E2, `psql`/BI analog) —
  * load a logs table (parquet dir or NDJSON capture), register the
  * decode functions and the generated event views, run a SQL query.
  *
  * Usage: runMain graft.tools.RunSql <logsPathOrNdjson> <sql>
  */
object RunSql {
  def main(args: Array[String]): Unit = {
    val Array(path, sql) = args.take(2)
    val spark = GraftSession.get()
    val logs =
      if (path.endsWith(".ndjson") || path.endsWith(".json"))
        Logs.readNdjson(spark, path)
      else Logs.read(spark, path)
    logs.createOrReplaceTempView("logs")
    Abi.registerSqlFunctions(spark)
    EventViews.registerAll(spark, Logs.canonical(logs))
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }
}
