package graft.tools
import graft.{GraftSession, SparkEntry}

/** CLI: dump `.explain("formatted")` for a comma-separated list of
  * SparkEntry queries into files — the optimization-round plan-audit
  * tool (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.PlanDump <q1,q2,...> <sfDir> <outDir> <suffix>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val outDir = args(2)
    val suffix = args(3)
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
    sys.exit(0)
  }
}
