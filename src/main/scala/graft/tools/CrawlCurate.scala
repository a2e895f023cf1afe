package graft.tools

import graft.GraftSession
import graft.streaming.DocStream

/** CLI: the arriving-crawl pipeline — tail-follow a directory of WET
  * shards ([[graft.sources.WarcSource]] streaming read) and curate
  * each arriving segment through quality + incremental near-dup into
  * a growing corpus + MinHash index
  * ([[graft.streaming.DocStream.curateWetCrawl]]).
  *
  * Usage:
  *   runMain graft.tools.CrawlCurate <warcDir> <outDir> [quality|gopher] [pollSeconds]
  *
  * `<outDir>` receives `corpus/` (parquet, one row per admitted page
  * with target_uri + quality), `index/` (MinHash signatures) and
  * `ckpt/` (stream checkpoint — re-runs resume exactly-once).
  * The gate (r13) picks the quality filter: `quality` (default, the
  * scalar `qualityScore >= 0.2`) or `gopher` (the Gopher rule set —
  * the same trees the gated batch composition q120 runs).
  * Without `pollSeconds` the run drains what is present and stops
  * (Trigger.AvailableNow — the bounded-run probe); with it the
  * stream keeps polling for new segment files until Ctrl-C, printing
  * `[neardup] batch=… kept=…` per micro-batch. */
object CrawlCurate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CrawlCurate <warcDir> <outDir> [quality|gopher] [pollSeconds]")
    val warcDir = args(0)
    val out = args(1)
    val rest = args.drop(2)
    // gate tokens match case-insensitively; anything that is neither a
    // gate nor a poll-seconds integer fails with the usage line (r14,
    // advisor: `Gopher 30` used to silently run the Quality gate and
    // then die on `"Gopher".toInt`)
    val gateToken = rest.headOption.map(_.toLowerCase(java.util.Locale.ROOT))
      .filter(a => a == "gopher" || a == "quality")
    val gate = gateToken match {
      case Some("gopher") => DocStream.CrawlGate.Gopher()
      case _ => DocStream.CrawlGate.Quality()
    }
    val pollArg = if (gateToken.isDefined) rest.lift(1) else rest.headOption
    val poll = pollArg.map { s =>
      require(s.forall(_.isDigit) && s.nonEmpty,
        s"unrecognized argument '$s' — " +
          "usage: CrawlCurate <warcDir> <outDir> [quality|gopher] [pollSeconds]")
      s"${s.toInt} seconds"
    }
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val q = DocStream.curateWetCrawl(spark, warcDir,
      corpusDir = s"$out/corpus", indexDir = s"$out/index",
      checkpointDir = s"$out/ckpt", gate = gate, pollInterval = poll)
    q.awaitTermination()
    val n = scala.util.Try(
      spark.read.parquet(s"$out/corpus").count()).getOrElse(0L)
    println(s"[crawl] done corpus=$n docs at $out/corpus")
    spark.stop()
  }
}
