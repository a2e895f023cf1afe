package graft.tools

import graft.GraftSession
import graft.operators.Corpus

/** CLI: per-shard health profile of a crawl segment directory (r14)
  * — the first thing to run on a new crawl, BEFORE curation: record
  * mix, status classes, pipeline eligibility, coding distribution,
  * and the loud-null counters of every decode layer
  * ([[graft.operators.Corpus.crawlHealth]]).
  *
  * Usage:
  *   runMain graft.tools.ProfileCrawl <warcDir>
  *
  * A segment with a high `n_decode_null` / `n_charset_null` share is
  * broken or hostile — inspect before feeding it to CrawlCurate. */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ProfileCrawl <warcDir>")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val health = Corpus.crawlHealth(spark, args(0))
      .orderBy(org.apache.spark.sql.functions.col("shard"))
    health.show(1000, truncate = false)
    val t = health.selectExpr("sum(n_records) as records",
      "sum(n_eligible) as eligible", "sum(n_no_body) as no_body",
      "sum(n_decode_null) as decode_null",
      "sum(n_charset_null) as charset_null", "sum(n_pages) as pages").first()
    println(s"[crawl-health] records=${t.getLong(0)} eligible=${t.getLong(1)} " +
      s"no_body=${t.getLong(2)} decode_null=${t.getLong(3)} " +
      s"charset_null=${t.getLong(4)} pages=${t.getLong(5)}")
    spark.stop()
  }
}
