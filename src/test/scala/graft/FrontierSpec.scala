package graft

import graft.operators.Frontier
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private val delays = Seq(("slow.example", 2.5), ("fast.example", 0.2))
    .toDF("host", "crawl_delay")

  test("slots respect per-host delay, default applies, arithmetic exact") {
    val urls = Seq(
      "http://slow.example/b", "http://slow.example/a", "http://slow.example/c",
      "http://fast.example/x", "http://plain.example/p", "http://plain.example/q")
      .toDF("url")
    val plan = Frontier.schedule(urls, "url", delays, defaultDelaySec = 1.0)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // lexicographic per-host order; offsets = seq * floor(delay * 1000)
    assert(plan("http://slow.example/a") === (("slow.example", 0L, 2500L, 0L)))
    assert(plan("http://slow.example/b") === (("slow.example", 1L, 2500L, 2500L)))
    assert(plan("http://slow.example/c") === (("slow.example", 2L, 2500L, 5000L)))
    assert(plan("http://fast.example/x") === (("fast.example", 0L, 200L, 0L)))
    assert(plan("http://plain.example/p") === (("plain.example", 0L, 1000L, 0L)))
    assert(plan("http://plain.example/q") === (("plain.example", 1L, 1000L, 1000L)))
  }

  test("one worker per host, workers within range, md5 family replayable") {
    val urls = (1 to 50).map(i => s"http://h${i % 9}.example/p$i").toDF("url")
    val plan = Frontier.schedule(urls, "url", delays, nWorkers = 4, family = "md5")
      .select("host", "worker").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(plan.forall { case (_, w) => w >= 0 && w < 4 })
    assert(plan.groupBy(_._1).values.forall(ws => ws.map(_._2).distinct.size === 1))
    // replayable: pmod(md5-prefix hash, nWorkers) — the oracle family rule
    val h0 = graft.functions.Md5Family.md5Prefix60("h0.example")
    assert(plan.toMap.apply("h0.example") ===
      java.lang.Math.floorMod(h0, 4L))
  }

  test("recrawlStatus: new/modified/aged/fresh matrix, malformed lastmod falls back") {
    val entries = Seq(
      ("u1", "2026-02-01"),                  // fetched Jan 10, lm after → modified
      ("u2", "2026-01-05T09:00:00Z"),        // lm before fetch → fresh (trust it)
      ("u3", null.asInstanceOf[String]),     // no lm, fetched Jan 1 → aged (45d)
      ("u4", "garbage-date"),                // unparsable lm, fetched Feb 10 → fresh (5d)
      ("u5", "2026-02-01"))                  // never fetched → new
      .toDF("loc", "lastmod")
    val fetched = Seq(("u1", "2026-01-10"), ("u2", "2026-01-10"),
      ("u3", "2026-01-01"), ("u4", "2026-02-10")).toDF("url", "fetched_at")
    val got = graft.operators.Frontier.recrawlStatus(entries, "loc", "lastmod",
        fetched, "url", "fetched_at", asOf = "2026-02-15", maxAgeDays = 30)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got === Map(
      "u1" -> (("modified", 36L)), "u2" -> (("fresh", 36L)),
      "u3" -> (("aged", 45L)), "u4" -> (("fresh", 5L)),
      "u5" -> (("new", -1L))))
  }

  test("maxPerHost truncates each host's cycle; rankCol orders the queue") {
    val urls = Seq(
      ("http://h.example/low", 9L), ("http://h.example/high", 1L),
      ("http://h.example/mid", 5L), ("http://h.example/cut", 10L))
      .toDF("url", "prio")
    val plan = Frontier.schedule(urls, "url", delays, maxPerHost = 3,
        rankCol = Some("prio"))
      .select("url", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan === Map(
      "http://h.example/high" -> 0L,
      "http://h.example/mid" -> 1L,
      "http://h.example/low" -> 2L))
  }
}
