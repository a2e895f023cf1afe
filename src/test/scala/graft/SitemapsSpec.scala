package graft

import graft.operators.Sitemaps
import org.apache.spark.sql.functions._

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xml: String) =
    Sitemaps.parse(Seq(("s1", xml)).toDF("k", "xml"), "xml")
      .select("kind", "loc", "lastmod", "changefreq", "priority")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4))))
      .toSeq

  test("urlset entries: all elements, entities, whitespace, missing loc dropped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> http://h.example/a?x=1&amp;y=2 </loc>
        |    <lastmod>2026-01-15</lastmod>
        |    <changefreq>Daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>http://h.example/b</loc></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |  <url><loc>http://h.example/c</loc><priority>high</priority></url>
        |</urlset>""".stripMargin
    assert(rows(xml) === Seq(
      ("url", "http://h.example/a?x=1&y=2", "2026-01-15", "daily", Double.box(0.8)),
      ("url", "http://h.example/b", null, null, null),
      ("url", "http://h.example/c", null, null, null)))
  }

  test("sitemapindex entries and namespace prefixes") {
    val xml =
      """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:sitemap><sm:loc>http://h.example/sm1.xml.gz</sm:loc>
        |    <sm:lastmod>2026-02-01T10:00:00Z</sm:lastmod></sm:sitemap>
        |  <sm:sitemap><sm:loc>http://h.example/sm2.xml</sm:loc></sm:sitemap>
        |</sm:sitemapindex>""".stripMargin
    assert(rows(xml) === Seq(
      ("sitemap", "http://h.example/sm1.xml.gz", "2026-02-01T10:00:00Z", null, null),
      ("sitemap", "http://h.example/sm2.xml", null, null, null)))
  }

  test("a namespace prefix that itself starts with 'sitemap' is not kind='sitemap' (r16)") {
    // <sitemap:url> is a PAGE entry under an ugly-but-legal prefix;
    // without the tag-end anchor the kind regex backtracked the
    // prefix to empty and matched the literal 'sitemap'
    val xml =
      """<sitemap:urlset xmlns:sitemap="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap:url><sitemap:loc>http://h.example/p1</sitemap:loc></sitemap:url>
        |</sitemap:urlset>""".stripMargin
    assert(rows(xml) === Seq(("url", "http://h.example/p1", null, null, null)))
  }

  test("entriesOf magic-sniffs a gzip FILE served without Content-Encoding (r16)") {
    val xml = "<urlset><url><loc>http://h.example/gz1</loc></url></urlset>"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes("UTF-8")); gz.close()
    val crawl = Seq(
      ("response", "http://h.example/sitemap.xml.gz", 200,
        "application/octet-stream", null: String, null: String, bos.toByteArray),
      // a DECLARED encoding must not be overridden by the sniff
      ("response", "http://h.example/declared.xml.gz", 200,
        "application/octet-stream", "gzip", null: String, bos.toByteArray))
      .toDF("warc_type", "target_uri", "http_status", "http_content_type",
        "http_content_encoding", "http_transfer_encoding", "body")
    val got = Sitemaps.entriesOf(crawl)
      .select("sitemap_url", "loc").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("http://h.example/sitemap.xml.gz", "http://h.example/gz1"),
      ("http://h.example/declared.xml.gz", "http://h.example/gz1")))
  }

  test("entriesOf sniffs sitemap bodies off a crawl frame, skips pages") {
    def env(uri: String, ctype: String, body: String) =
      ("response", uri, 200, ctype, null: String, null: String,
        body.getBytes("UTF-8"))
    val crawl = Seq(
      env("http://h.example/sitemap.xml", "application/xml",
        "<urlset><url><loc>http://h.example/p1</loc></url></urlset>"),
      env("http://h.example/sm-octet", "application/octet-stream",
        "<?xml version=\"1.0\"?>\n<!-- gen --><sitemapindex><sitemap>" +
          "<loc>http://h.example/child.xml</loc></sitemap></sitemapindex>"),
      env("http://h.example/page.html", "text/html",
        "<html><body><urlset>decoy text, not a root element</urlset></body></html>"),
      env("http://h.example/feed.xml", "text/xml",
        "<rss version=\"2.0\"><channel></channel></rss>"))
      .toDF("warc_type", "target_uri", "http_status", "http_content_type",
        "http_content_encoding", "http_transfer_encoding", "body")
    val got = Sitemaps.entriesOf(crawl)
      .select("sitemap_url", "kind", "loc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("http://h.example/sitemap.xml", "url", "http://h.example/p1"),
      ("http://h.example/sm-octet", "sitemap", "http://h.example/child.xml")))
  }
}
