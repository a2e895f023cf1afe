package graft

import graft.sinks.WarcShards

class PlanCrawlSpec extends SparkSpec {
  import spark.implicits._

  test("plan composes sitemaps, outlinks, robots gate and crawl delays end-to-end") {
    val base = java.nio.file.Files.createTempDirectory("graft_plancrawl").toString
    def env(ctype: String, body: String): Array[Byte] = {
      val b = body.getBytes("UTF-8")
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${b.length}\r\n\r\n").getBytes("UTF-8") ++ b
    }
    val rows = Seq(
      ("r1", "http://a.example/robots.txt", env("text/plain",
        "User-agent: *\nDisallow: /blk/\nCrawl-delay: 2\n" +
          "Sitemap: http://a.example/sm.xml\n")),
      ("s1", "http://a.example/sm.xml", env("application/xml",
        "<urlset><url><loc>http://a.example/new1</loc></url>" +
          "<url><loc>http://a.example/blk/new2</loc></url>" +
          "<url><loc>http://a.example/fetched</loc></url></urlset>")),
      ("p1", "http://a.example/fetched", env("text/html",
        "<html><a href=\"/new3\">x</a><a href=\"/blk/new4\">y</a>" +
          "<a href=\"http://b.example/x\">z</a></html>")),
      // page-level meta nofollow: none of this page's links may enter
      // the candidate set (r15)
      ("p2", "http://a.example/nf", env("text/html",
        "<html><head><meta name=\"robots\" content=\"nofollow\"></head>" +
          "<body><a href=\"/never1\">n</a>" +
          "<a href=\"http://c.example/never2\">m</a></body></html>")))
      .toDF("k", "u", "p")
    WarcShards.write(rows, "k", "u", "p", base, nShards = 1,
      warcType = "response",
      contentType = "application/http; msgtype=response")
    val crawl = spark.read.format("graft.sources.WarcSource")
      .option("path", base).load()
    val plan = graft.tools.PlanCrawl.plan(crawl, nWorkers = 4)
      .select("url", "host", "seq", "delay_ms", "fetch_offset_ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    // sitemap locs + outlinks, minus already-fetched (/fetched, sm.xml,
    // robots.txt), minus /blk/* (robots), scheduled at 2 s for
    // a.example (Crawl-delay) and the 1 s default for b.example
    assert(plan === Set(
      ("http://a.example/new1", "a.example", 0L, 2000L, 0L),
      ("http://a.example/new3", "a.example", 1L, 2000L, 2000L),
      ("http://b.example/x", "b.example", 0L, 1000L, 0L)))
  }
}
