package graft

import graft.operators.Links
import org.apache.spark.sql.functions._

class LinksSpec extends SparkSpec {
  import spark.implicits._

  private def links(pageUrl: String, html: String): Seq[String] =
    Links.outlinks(Seq((pageUrl, html)).toDF("u", "h"), "u", "h")
      .select("url").collect().map(_.getString(0)).toSeq

  test("quoting forms, case-insensitivity and attribute noise") {
    val out = links("http://a.example/dir/page.html",
      """<A HREF="/dq">x</A> <a class=nav href='/sq'>y</a>
        |<a rel=nofollow href=/uq>z</a> <a name="no-href">n</a>
        |<area href="/not-an-anchor"> <a data-href="/decoy" href="/real">r</a>""".stripMargin)
    assert(out.toSet === Set("http://a.example/dq", "http://a.example/sq",
      "http://a.example/uq", "http://a.example/real"))
  }

  test("resolution: absolute, scheme-relative, rooted, relative, query-only, dot segments") {
    val out = links("https://h.example/a/b/page.html?x=1",
      """<a href="https://other.example/abs?q=2">1</a>
        |<a href="//cdn.example/lib.js">2</a>
        |<a href="/rooted/p">3</a>
        |<a href="sib.html">4</a>
        |<a href="./same/dir">5</a>
        |<a href="../up/one">6</a>
        |<a href="../../up/two">7</a>
        |<a href="?only=query">8</a>""".stripMargin)
    assert(out === Seq(
      "https://other.example/abs?q=2",
      "https://cdn.example/lib.js",
      "https://h.example/rooted/p",
      "https://h.example/a/b/sib.html",
      "https://h.example/a/b/same/dir",
      "https://h.example/a/up/one",
      "https://h.example/up/two",
      "https://h.example/a/b/page.html?only=query"))
  }

  test("drops: fragments, empty, non-fetchable schemes, non-http results; entities decode") {
    val out = links("http://h.example/p",
      """<a href="#section">f</a> <a href="">e</a>
        |<a href="mailto:x@y.example">m</a> <a href="javascript:void(0)">j</a>
        |<a href="tel:+1-555">t</a> <a href="ftp://files.example/f">ftp</a>
        |<a href="/q?a=1&amp;b=2#frag">ok</a>""".stripMargin)
    assert(out === Seq("http://h.example/q?a=1&b=2"))
  }

  test("multiplicity kept; dot-segment clamp above root") {
    val out = links("http://h.example/a/p",
      """<a href="/x">1</a><a href="/x">2</a><a href="../../../deep">3</a>""")
    assert(out === Seq("http://h.example/x", "http://h.example/x",
      "http://h.example/deep"))
  }

  test("url_host column matches the resolved url's host in every case") {
    val df = Links.outlinks(Seq(
      ("http://base.example/d/p", """<a href="/r">a</a><a href="//cdn.example:8080/x">b</a>
        |<a href="HTTPS://Abs.Example/y">c</a><a href="rel">d</a>""".stripMargin))
      .toDF("u", "h"), "u", "h")
    val rows = df.select("url", "url_host").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(
      ("http://base.example/r", "base.example"),
      ("http://cdn.example:8080/x", "cdn.example:8080"),
      ("HTTPS://Abs.Example/y", "abs.example"),
      ("http://base.example/d/rel", "base.example")))
  }

  test("normalizeDotSegments directly") {
    val cases = Seq(
      "/a/b/../c" -> "/a/c",
      "/a/./b/." -> "/a/b/",
      "/../a" -> "/a",
      "/a/../../b" -> "/b",
      "/a/b/c/../../d" -> "/a/d",
      "/.." -> "/",
      "/a/.." -> "/",
      "/..a/b" -> "/..a/b")
    val df = cases.map(_._1).toDF("p")
      .select(col("p"), Links.normalizeDotSegments(col("p")).as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases) assert(got(in) === want, s"input $in")
  }

  test("hostGraph aggregates with internal flag") {
    val l = Seq(
      ("http://a.example/1", "http://b.example/x"),
      ("http://a.example/2", "http://b.example/y"),
      ("http://a.example/1", "http://a.example/self"),
      ("http://b.example/1", "http://a.example/z"))
      .toDF("page_url", "url")
    val g = Links.hostGraph(l).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(g === Set(
      ("a.example", "b.example", 2L, false),
      ("a.example", "a.example", 1L, true),
      ("b.example", "a.example", 1L, false)))
  }

  /** Exact integer reference simulation of the operator's contract. */
  private def simulate(edges: Set[(String, String)], iters: Int,
      scale: Long): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> scale / n).toMap
    val base = 15L * scale / (100L * n)
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += rank(s) / out(s)
      rank = nodes.map(v => v -> (base + 85L * (contrib(v) + dang / n) / 100L)).toMap
    }
    rank
  }

  test("pageRank matches the exact integer simulation, self-loops and dup edges ignored") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "e"),
      ("d", "c"), ("a", "b") /* dup */, ("b", "b") /* self-loop */)
      .toDF("s", "t")
    val got = Links.pageRank(edges, "s", "t", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = simulate(
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "e"), ("d", "c")),
      3, 1000000000000L)
    assert(got === want)
    // e is a sink (no out-edges): its mass must have been redistributed,
    // not hoarded — every node keeps a rank above the teleport floor
    assert(got.values.forall(_ >= 15L * 1000000000000L / (100L * 5L)))
  }

  test("weighted pageRank: multiplicity changes the ordering; weight 1 is bit-identical (r16)") {
    // a -> b and a -> c: simple-graph ranks tie b and c exactly;
    // weighting a->b 3x must break the tie toward b
    val flat = Seq(("a", "b", 1L), ("a", "c", 1L)).toDF("s", "t", "w")
    val tied = Links.pageRank(flat, "s", "t", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tied("b") === tied("c"))
    val weighted = Links.pageRank(
        Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("s", "t", "w"),
        "s", "t", iterations = 3, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weighted("b") > weighted("c"))
    // weight 1 everywhere = the unweighted ranks, bit for bit
    val w1 = Links.pageRank(flat, "s", "t", iterations = 3,
        weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w1 === tied)
    // duplicate weighted edges SUM: (a->b w2) + (a->b w1) == (a->b w3)
    val summed = Links.pageRank(
        Seq(("a", "b", 2L), ("a", "b", 1L), ("a", "c", 1L)).toDF("s", "t", "w"),
        "s", "t", iterations = 3, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summed === weighted)
  }

  test("nofollow flag: rel list membership in any quoting, never a substring match") {
    val out = Links.outlinks(Seq(
      ("http://h.example/p",
        """<a rel="nofollow" href="/a">1</a><a rel='ugc nofollow' href="/b">2</a>
          |<a rel=nofollow href="/c">3</a><a rel="external" href="/d">4</a>
          |<a rel="nofollowish" href="/e">5</a><a href="/f">6</a>""".stripMargin))
      .toDF("u", "h"), "u", "h")
      .collect().map(r => (r.getString(1), r.getBoolean(3))).toMap
    assert(out === Map(
      "http://h.example/a" -> true, "http://h.example/b" -> true,
      "http://h.example/c" -> true, "http://h.example/d" -> false,
      "http://h.example/e" -> false, "http://h.example/f" -> false))
  }

  test("metaRobots: attribute orders, quoting, case, list membership, bot-specific ignored") {
    val rows = Seq(
      ("both", "<meta name=\"robots\" content=\"noindex, nofollow\">"),
      ("ni", "<meta name='robots' content='noindex'>"),
      ("nf-rev", "<META CONTENT=\"NOFOLLOW\" NAME=\"ROBOTS\">"),
      ("unq", "<meta name=robots content=nofollow,noindex>"),
      ("bot", "<meta name=\"googlebot\" content=\"noindex\">"),
      ("other", "<meta name=\"robots\" content=\"max-snippet:-1\">"),
      ("none", "<meta charset=\"utf-8\"><p>noindex as text</p>"))
      .toDF("k", "html")
    val got = Links.metaRobots(rows, "html")
      .collect().map(r => r.getString(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got === Map(
      "both" -> ((true, true)), "ni" -> ((true, false)),
      "nf-rev" -> ((false, true)), "unq" -> ((true, true)),
      "bot" -> ((false, false)), "other" -> ((false, false)),
      "none" -> ((false, false))))
  }

  test("registeredDomain: suffix table, ports, IPs, shallow hosts; gateByDomain allow mode") {
    val cases = Seq(
      "www.example.co.uk" -> "example.co.uk",
      "a.b.c.example.com" -> "example.com",
      "Example.COM:8080" -> "example.com",
      "example.de" -> "example.de",
      "localhost" -> "localhost",
      "192.168.0.7" -> "192.168.0.7",
      "deep.sub.site.com.au" -> "site.com.au")
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), Links.registeredDomain(col("h")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((h, want) <- cases) assert(got(h) === want, s"host $h")
    val docs = Seq("http://a.keep.com/1", "http://b.drop.com/2").toDF("url")
    val allow = Seq("keep.com").toDF("domain")
    val kept = Links.gateByDomain(docs, "url", allow, mode = "allow")
      .collect().map(_.getString(0)).toSeq
    assert(kept === Seq("http://a.keep.com/1"))
  }

  test("crawlTextOf dropNoindex: noindex pages never reach the text chain (r15)") {
    def rec(uri: String, body: String) =
      ("response", uri, 200, "text/html; charset=utf-8",
        null: String, null: String, body.getBytes("UTF-8"))
    val crawl = Seq(
      rec("http://h.example/keep", "<html><body>kept page</body></html>"),
      rec("http://h.example/drop",
        "<html><head><meta name=\"robots\" content=\"noindex\"></head>" +
          "<body>hidden</body></html>"))
      .toDF("warc_type", "target_uri", "http_status", "http_content_type",
        "http_content_encoding", "http_transfer_encoding", "body")
    val kept = graft.sources.WarcSource.crawlTextOf(crawl, dropNoindex = true)
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(kept === Set("http://h.example/keep"))
    // historical default: both pages flow (WET parity)
    val all = graft.sources.WarcSource.crawlTextOf(crawl)
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(all.size === 2)
  }

  test("outlinksWithText: nested markup, entities, empty and unclosed anchors") {
    val out = Links.outlinksWithText(Seq(
      ("http://h.example/p",
        "<a href=\"/a\">Read <i>the</i>&amp;<b>docs</b></a>" +
          "<a href=\"/b\"></a><a href=\"/c\">no close tag")).toDF("u", "h"),
      "u", "h")
      .select("url", "anchor_text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(
      ("http://h.example/a", "Read the & docs"),
      ("http://h.example/b", "")))
  }

  test("redirects: 3xx + Location off the envelope, relative targets resolve, chaff drops") {
    val rows = Seq(
      ("response", "http://a.example/old", 301, "http://b.example/new"),
      ("response", "http://a.example/dir/x", 302, "moved"),
      ("response", "http://a.example/y", 307, "/root/../r"),
      ("response", "http://a.example/z", 308, "//cdn.example/c"),
      ("response", "http://a.example/ok", 200, "http://ignored.example/"),
      ("response", "http://a.example/ftp", 301, "ftp://files.example/f"),
      ("response", "http://a.example/none", 301, null))
      .toDF("warc_type", "target_uri", "http_status", "http_location")
    val got = graft.operators.Links.redirects(rows)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("http://a.example/old", "http://b.example/new", "b.example"),
      ("http://a.example/dir/x", "http://a.example/dir/moved", "a.example"),
      ("http://a.example/y", "http://a.example/r", "a.example"),
      ("http://a.example/z", "http://cdn.example/c", "cdn.example")))
  }

  test("resolveRedirects: pointer doubling collapses chains, cycles surface as non-terminal") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), // 4-hop chain
      ("x", "y"),                                     // 1 hop
      ("p", "q"), ("q", "p"))                         // cycle
      .toDF("from_url", "to_url")
    val got = Links.resolveRedirects(edges, maxHops = 8)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got("a") === (("e", 4L, true)))
    assert(got("b") === (("e", 3L, true)))
    assert(got("x") === (("y", 1L, true)))
    assert(!got("p")._3 && !got("q")._3) // cycle: never terminal
  }

  test("pageRank is partition-order invariant (bit-identical)") {
    val edges = (1 to 60).map(i => (s"n${i % 7}", s"n${(i * 3 + 1) % 7}")).toDF("s", "t")
    val a = Links.pageRank(edges, "s", "t", iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Links.pageRank(edges.repartition(13), "s", "t", iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
