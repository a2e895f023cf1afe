package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** sitemaps.org XML parsing (beyond-reference): the discovery side of
  * the crawl loop. [[graft.operators.Robots.sitemapsOf]] surfaces the
  * `Sitemap:` POINTERS a host declares; this operator parses the
  * pointed-at documents — `<urlset>` page entries and
  * `<sitemapindex>` child-sitemap entries — into rows a frontier can
  * consume ([[Frontier.schedule]] downstream).
  *
  * Parsing is regex-over-blocks in the Java∩RE2 subset, the same
  * zero-DOM trade the link extractor makes: one
  * `regexp_extract_all` per document finds the entry blocks
  * (non-greedy `(?is)` spans), the blocks explode (one Generate), and
  * per-block element extraction reads the generated attribute — the
  * body is scanned once per document regardless of entry count.
  * Namespace prefixes are accepted on entry/element tags (`<sm:url>`
  * arrives in the wild); CDATA sections are NOT unwrapped (rare in
  * sitemaps, documented boundary). `<loc>` values decode the five
  * predefined XML entities (`&amp;` is mandatory XML escaping for
  * URLs with queries) and trim surrounding whitespace, per the
  * protocol's own examples. */
object Sitemaps {

  private def tagText(block: Column, tag: String): Column =
    decodeBasic(trim(regexp_extract(block,
      s"(?is)<(?:[A-Za-z0-9_.\\-]+:)?$tag(?:\\s[^>]*)?>(.*?)</(?:[A-Za-z0-9_.\\-]+:)?$tag>", 1)))

  private def decodeBasic(c: Column): Column = Links.decodeBasicEntities(c)

  /** Parse sitemap XML bodies: one row per entry —
    * `(kind, loc, lastmod, changefreq, priority)` where `kind` is
    * `url` (a page, from `<urlset>`) or `sitemap` (a child sitemap,
    * from `<sitemapindex>`). Entries without a `<loc>` are dropped
    * (the protocol requires one); `lastmod`/`changefreq` stay the
    * raw declared strings (W3C datetime validation is the consumer's
    * choice — a frontier treats an unparsable lastmod as absent);
    * `priority` casts to double, null when non-numeric (Spark and
    * DuckDB parse decimal literals identically).
    *
    * Input: any frame with a body STRING column (already
    * charset-decoded; for crawl captures ride
    * [[entriesOf]] which reuses the response decode chain). Every
    * input column is carried through, so callers keep their keys. */
  def parse(df: DataFrame, xmlCol: String): DataFrame = {
    val pre = "(?:[A-Za-z0-9_.\\-]+:)?"
    val entries = df.withColumn("_entry",
      explode(regexp_extract_all(col(xmlCol),
        lit(s"(?is)<$pre(?:url|sitemap)(?:\\s[^>]*)?>.*?</$pre(?:url|sitemap)>"),
        lit(0))))
    entries
      .withColumn("kind",
        // anchor the tag END too: a namespace prefix that itself
        // starts with "sitemap" (<sitemap:url>) must not read as
        // kind='sitemap' — the block regex guarantees the entry tag
        // is followed by whitespace or '>'
        when(lower(col("_entry")).rlike(s"^<$pre" + "sitemap[\\s>]"), lit("sitemap"))
          .otherwise(lit("url")))
      .withColumn("loc", tagText(col("_entry"), "loc"))
      .withColumn("lastmod", nullif(tagText(col("_entry"), "lastmod"), lit("")))
      .withColumn("changefreq", nullif(lower(tagText(col("_entry"), "changefreq")), lit("")))
      .withColumn("priority",
        nullif(tagText(col("_entry"), "priority"), lit("")).cast(DoubleType))
      .filter(col("loc") =!= "")
      .drop("_entry")
  }

  /** Sitemap entries straight off a raw crawl frame: 2xx responses
    * whose decoded body opens with a sitemap root element (content
    * sniff, not content-type — servers label sitemaps as everything
    * from `text/xml` to `application/octet-stream`), parsed by
    * [[parse]]. Gzip'd sitemap bodies (`sitemap.xml.gz`) arrive
    * transparently when the server declares Content-Encoding — the
    * shared response decode chain inflates them — and (r16) a gzip
    * FILE served WITHOUT the header (`application/octet-stream`, the
    * common case for sitemap-index children on large sites) is
    * magic-sniffed: a body opening `1F 8B` with no declared
    * content/transfer encoding is routed through the same inflate.
    * The sniff reads the RAW body, so a chunk-framed gzip file still
    * needs its Transfer-Encoding declared (framed bytes don't open
    * with the magic — documented residual boundary). Output:
    * `(sitemap_url, kind, loc, lastmod, changefreq, priority)`. */
  def entriesOf(warc: DataFrame): DataFrame = {
    val pre = "(?:[A-Za-z0-9_.\\-]+:)?"
    val gzMagic = lit(Array[Byte](0x1f.toByte, 0x8b.toByte))
    val noEnc = (col("http_content_encoding").isNull ||
        col("http_content_encoding") === "") &&
      (col("http_transfer_encoding").isNull ||
        col("http_transfer_encoding") === "")
    val sniffed = warc.withColumn("http_content_encoding",
      when(noEnc && substring(col("body"), 1, 2) === gzMagic, lit("gzip"))
        .otherwise(col("http_content_encoding")))
    val decoded = graft.sources.WarcSource.responseTextOf(
      sniffed.withColumn("http_content_type",
        // responseTextOf keeps text/* and application/xhtml+xml; let
        // xml-ish labels through too, the body sniff below decides
        when(lower(col("http_content_type")).rlike("(?i)xml|octet-stream"),
          concat(lit("text/xml;sniff "), coalesce(col("http_content_type"), lit(""))))
          .otherwise(col("http_content_type"))))
      .filter(col("html").isNotNull &&
        col("html").rlike(s"(?is)^(?:\\s|<\\?[^>]*>|<!--.*?-->)*<$pre(?:urlset|sitemapindex)[\\s>]"))
      .select(col("target_uri").as("sitemap_url"), col("html"))
    parse(decoded, "html").drop("html")
  }
}
