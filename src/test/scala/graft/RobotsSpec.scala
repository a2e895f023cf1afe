package graft

import graft.operators.Robots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  /** A minimal WarcSource-shaped response record. */
  private def rec(uri: String, status: Int, body: String,
      ce: String = null, te: String = null): (String, String, Int, String, String, String, Array[Byte]) =
    ("response", uri, status, "text/plain", ce, te, body.getBytes("UTF-8"))

  private def frame(rows: Seq[(String, String, Int, String, String, String, Array[Byte])]): DataFrame =
    rows.toDF("warc_type", "target_uri", "http_status", "http_content_type",
      "http_content_encoding", "http_transfer_encoding", "body")

  private def ruleSet(df: DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def verdicts(urls: Seq[String], rules: DataFrame): Map[String, Boolean] = {
    val pages = urls.toDF("url")
    Robots.gate(pages, rules, "url").select("url", "allowed")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  test("group semantics: leading rules ignored, multi-UA groups, comments, empty Disallow, sitemap") {
    val body =
      """Disallow: /ignored-no-group/
        |# a comment line
        |User-agent: fooBot
        |User-agent: *
        |Disallow: /a/   # trailing comment
        |Allow: /a/b
        |
        |Disallow: /after-blank/
        |User-agent: barBot
        |Disallow: /bar-only/
        |Sitemap: http://h.example/sm.xml
        |User-agent: *
        |Disallow:
        |""".stripMargin
    val rules = Robots.rulesOf(frame(Seq(rec("http://h.example/robots.txt", 200, body))))
    // leading rule dropped (group 0); blank line does NOT end a group
    // (RFC 9309, unlike REP-1994); barBot's group excluded; empty
    // Disallow matches nothing and is dropped; Sitemap is not a rule
    assert(ruleSet(rules) === Set(
      ("h.example", "disallow", "/a/"),
      ("h.example", "allow", "/a/b"),
      ("h.example", "disallow", "/after-blank/")))
  }

  test("agent selection: specific group beats star, product token case-folds") {
    val body =
      """User-Agent: GraftBot
        |Disallow: /graft/
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val f = frame(Seq(rec("http://h.example/robots.txt", 200, body)))
    val mine = Robots.rulesOf(f, agent = "graftbot")
    assert(ruleSet(mine) === Set(("h.example", "disallow", "/graft/")))
    val other = Robots.rulesOf(f, agent = "someoneelse")
    assert(ruleSet(other) === Set(("h.example", "disallow", "/")))
  }

  test("non-2xx and non-robots-path responses contribute no rules") {
    val f = frame(Seq(
      rec("http://h.example/robots.txt", 404, "User-agent: *\nDisallow: /\n"),
      rec("http://h.example/page.html", 200, "User-agent: *\nDisallow: /\n")))
    assert(Robots.rulesOf(f).count() === 0)
  }

  test("gzip content-encoded robots body decodes through the shared chain") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("User-agent: *\nDisallow: /z/\n".getBytes("UTF-8"))
    gz.close()
    val f = Seq(("response", "http://h.example/robots.txt", 200,
        "text/plain", "gzip", null: String, bos.toByteArray))
      .toDF("warc_type", "target_uri", "http_status", "http_content_type",
        "http_content_encoding", "http_transfer_encoding", "body")
    assert(ruleSet(Robots.rulesOf(f)) === Set(("h.example", "disallow", "/z/")))
  }

  test("RFC 9309 processing cap: rules past 500 KiB are not parsed") {
    val filler = ("#" + "x" * 98 + "\n") * 5300 // ~530 KB of comments
    val f = frame(Seq(
      rec("http://a.example/robots.txt", 200,
        "User-agent: *\nDisallow: /early/\n" + filler + "User-agent: *\nDisallow: /late/\n"),
      rec("http://b.example/robots.txt", 200,
        filler + "User-agent: *\nDisallow: /late/\n")))
    val rules = Robots.rulesOf(f)
    assert(ruleSet(rules) === Set(("a.example", "disallow", "/early/")))
  }

  test("duplicate robots captures for one host resolve deterministically") {
    val f = frame(Seq(
      rec("http://h.example/robots.txt", 200, "User-agent: *\nDisallow: /b/\n"),
      rec("http://h.example/robots.txt", 200, "User-agent: *\nDisallow: /a/\n")))
    // lexicographically smallest decoded body wins
    assert(ruleSet(Robots.rulesOf(f)) === Set(("h.example", "disallow", "/a/")))
  }

  test("longest match wins, allow wins a length tie, no rules means allowed") {
    val body =
      """User-agent: *
        |Disallow: /t/
        |Allow: /t/
        |Disallow: /a/
        |Allow: /a/b/
        |""".stripMargin
    val rules = Robots.rulesOf(frame(Seq(rec("http://h.example/robots.txt", 200, body))))
    val v = verdicts(Seq(
      "http://h.example/t/x", "http://h.example/a/only",
      "http://h.example/a/b/deep", "http://h.example/elsewhere",
      "http://nobody.example/anything"), rules)
    assert(v("http://h.example/t/x")) // tie: allow wins
    assert(!v("http://h.example/a/only")) // /a/ disallow, nothing longer
    assert(v("http://h.example/a/b/deep")) // longer allow beats shorter disallow
    assert(v("http://h.example/elsewhere")) // no rule matches
    assert(v("http://nobody.example/anything")) // host has no robots at all
  }

  test("wildcard * and trailing $ compile; regex metachars in patterns stay literal") {
    val body =
      """User-agent: *
        |Disallow: /*.png$
        |Disallow: /tmp*
        |Disallow: /lit.x/
        |""".stripMargin
    val rules = Robots.rulesOf(frame(Seq(rec("http://h.example/robots.txt", 200, body))))
    val v = verdicts(Seq(
      "http://h.example/img/z.png", "http://h.example/img/z.png.html",
      "http://h.example/tmp/a", "http://h.example/tmpfile",
      "http://h.example/lit.x/y", "http://h.example/litZx/y"), rules)
    assert(!v("http://h.example/img/z.png")) // $ anchors
    assert(v("http://h.example/img/z.png.html")) // anchored pattern must not match a prefix
    assert(!v("http://h.example/tmp/a") && !v("http://h.example/tmpfile"))
    assert(!v("http://h.example/lit.x/y"))
    assert(v("http://h.example/litZx/y")) // '.' escaped, not any-char
  }

  test("sitemaps are group-independent; crawl-delay is group-scoped, max wins, non-numeric drops") {
    val body =
      """Sitemap: http://h.example/Pre-Group.xml
        |User-agent: GraftBot
        |Crawl-delay: 2.5
        |Disallow: /g/
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: http://h.example/sm2.xml
        |User-agent: badBot
        |Crawl-delay: soon
        |""".stripMargin
    val f = frame(Seq(rec("http://h.example/robots.txt", 200, body)))
    // sitemaps: both lines, case preserved, regardless of groups
    assert(Robots.sitemapsOf(f).collect().map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("h.example", "http://h.example/Pre-Group.xml"),
              ("h.example", "http://h.example/sm2.xml")))
    // graftbot obeys ITS group's delay, not the star group's
    assert(Robots.crawlDelaysOf(f, "graftbot").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet === Set(("h.example", 2.5)))
    // an unmatched agent falls to the star group
    assert(Robots.crawlDelaysOf(f, "elsebot").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet === Set(("h.example", 10.0)))
    // badBot's own group has only a non-numeric delay → dropped → no row
    assert(Robots.crawlDelaysOf(f, "badbot").count() === 0)
  }

  test("gate keeps page columns, reports the winning rule, and row count is input row count") {
    val rules = Robots.rulesOf(frame(Seq(
      rec("http://h.example/robots.txt", 200, "User-agent: *\nDisallow: /p/\n"))))
    val pages = Seq(
      ("http://h.example/p/1", 11L), ("http://h.example/p/1", 12L),
      ("http://h.example/ok", 13L)).toDF("url", "payload")
    val out = Robots.gate(pages, rules, "url")
    assert(out.count() === 3)
    assert(out.columns.toSet === Set("url", "payload", "allowed", "rule", "pattern"))
    val byId = out.collect().map(r => r.getLong(1) ->
      (r.getBoolean(2), Option(r.getString(3)), Option(r.getString(4)))).toMap
    assert(byId(11L) === ((false, Some("disallow"), Some("/p/"))))
    assert(byId(12L) === ((false, Some("disallow"), Some("/p/"))))
    assert(byId(13L) === ((true, None, None)))
  }
}
