package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RFC 9309 robots-exclusion filtering over a crawl (beyond-reference;
  * the operator every polite training-data pipeline runs before
  * anything else touches a page).
  *
  * Two halves, both relational:
  *
  *  - [[rulesOf]] parses the crawl's own captured `/robots.txt`
  *    responses (they arrive as ordinary `response` records in the
  *    same WARC segment as the pages) into a small `(host, rule,
  *    pattern)` table — group semantics per RFC 9309 §2.2.1: a group
  *    is one or more consecutive `User-agent` lines followed by its
  *    rules; a crawler obeys the groups naming its OWN product token
  *    when any exist for the host, else the `*` groups (all matching
  *    groups merge); rules before any `User-agent` line are ignored;
  *    an empty `Disallow:` value matches nothing and is dropped.
  *  - [[gate]] joins pages to that table by host and applies
  *    longest-match precedence (§2.2.2): the rule whose pattern
  *    matches the page's path with the most octets wins; `Allow` wins
  *    a length tie. No matching rule, or no rules for the host at
  *    all, means ALLOWED (robots exclusion is opt-out).
  *
  * Pattern language: literal path prefixes plus the two de-facto
  * wildcards the RFC standardized — `*` (any run of characters) and a
  * trailing `$` (end-of-path anchor). [[regexOf]] compiles a pattern
  * column to an anchored regex; both engines' regex `find` semantics
  * agree on the compiled form (`^`-anchored, RE2-safe constructs
  * only). Paths and patterns are compared as given — percent-encoding
  * normalization belongs to the URL canonicalizer upstream (q73).
  *
  * Scale shape: the rules table is tiny relative to the crawl (a few
  * rows per distinct host) — [[gate]] broadcasts it and evaluates
  * verdicts once per DISTINCT url, then hash-joins verdicts back to
  * pages, so the regex work is O(distinct urls × rules-per-host),
  * never O(pages × rules). Parsing windows partition by host and are
  * bounded by the RFC 9309 §2.5 processing cap: only the first
  * 500 KiB of a robots body is parsed (a hostile million-line robots
  * file cannot create an unbounded per-host window). */
object Robots {

  /** RFC 9309 §2.5: a parser must process at least 500 KiB; we
    * process exactly that and ignore the rest (a loud, documented
    * bound — not silent truncation of ordinary files, which are KBs).
    * Applied in CHARACTERS after the UTF-8 decode — truncating raw
    * bytes could split a multibyte character and the strict decoder
    * would null the whole body, silently allowing the host. */
  private val MaxRobotsChars = 500 * 1024

  /** Lowercased authority (`host[:port]`) of an absolute URL. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]+)", 1))

  /** Path component of an absolute URL (query/fragment excluded);
    * empty path reads as "/". */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]+([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Compile a robots pattern to an anchored regex: regex metachars
    * escaped, `*` → `.*`, a TRAILING `$` → end anchor (a `$` anywhere
    * else is a literal octet, per the RFC's ABNF). */
  def regexOf(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    val esc = regexp_replace(body,
      "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|])", "\\\\$1")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Parse the robots rule table out of a loaded [[graft.sources.WarcSource]]
    * frame (batch or streaming — pure projections, windows and one
    * per-host aggregate). Emits `(host, rule, pattern)` with `rule ∈
    * {allow, disallow}`, already narrowed to the groups `agent` obeys.
    *
    * Input discipline mirrors [[graft.sources.WarcSource.responseTextOf]]:
    * successful (2xx) `/robots.txt` responses only, bodies
    * transfer-decoded (chunked framing off first), content-decoded
    * (gzip/deflate), then read as UTF-8 (RFC 9309 §2.3) with strict
    * null-on-malformed semantics. Should a host appear with several
    * captured robots bodies (re-crawls in one segment), the
    * lexicographically smallest decoded body wins — deterministic,
    * and any choice is honest when the captures disagree. */
  def rulesOf(warc: DataFrame, agent: String = "*"): DataFrame = {
    val grouped = groupedLines(warc)
    val ruleRows = grouped
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "" && col("grp") >= 1)
      .select(col("host"), col("grp"),
        col("directive").as("rule"), col("value").as("pattern"))
    ruleRows.join(applicableGroups(grouped, agent), Seq("host", "grp"))
      .select("host", "rule", "pattern").distinct()
  }

  /** One decoded robots body per host (see [[rulesOf]] for the
    * decode chain and the lexicographic tie-break). */
  private def robotsBodies(warc: DataFrame): DataFrame =
    warc
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        lower(pathOf(col("target_uri"))) === "/robots.txt")
      .withColumn("_deframed", graft.functions.HttpBody.httpTransferDecode(
        col("body"), lower(col("http_transfer_encoding"))))
      .withColumn("_raw", graft.functions.HttpBody.httpBodyDecode(
        col("_deframed"), lower(col("http_content_encoding"))))
      .select(hostOf(col("target_uri")).as("host"),
        graft.functions.CharsetDecode.charsetDecode(
          col("_raw"), lit("utf-8")).as("_txt0"))
      .filter(col("host") =!= "" && col("_txt0").isNotNull)
      .select(col("host"), substring(col("_txt0"), 1, MaxRobotsChars).as("_txt"))
      .groupBy(col("host")).agg(min(col("_txt")).as("_txt"))

  /** Parsed, group-assigned robots lines: `(host, ln, grp, _ua,
    * directive, value)`.
    *
    * line → (directive, value): comments stripped (a '#' starts one
    * anywhere on a line), CR/tab folded to spaces, outer space
    * trimmed; directives fold case, User-agent values fold case
    * (product tokens are case-insensitive), path patterns do NOT.
    *
    * RFC 9309 §2.2.1 group assignment: a User-agent line NOT
    * preceded by another User-agent line starts a new group; every
    * rule belongs to the most recent group (group 0 = before any
    * User-agent line = ignored). */
  private def groupedLines(warc: DataFrame): DataFrame = {
    val lines = robotsBodies(warc)
      .select(col("host"), posexplode(split(col("_txt"), "\n")).as(Seq("ln", "_l0")))
      .select(col("host"), col("ln"),
        trim(translate(regexp_replace(col("_l0"), "#.*", ""), "\r\t", "  ")).as("_l"))
      .select(col("host"), col("ln"),
        lower(regexp_extract(col("_l"), "^([A-Za-z\\-]+)\\s*:", 1)).as("directive"),
        trim(regexp_extract(col("_l"), "^[A-Za-z\\-]+\\s*:(.*)$", 1)).as("value"))
    val w = Window.partitionBy("host").orderBy("ln")
    lines
      .withColumn("_ua", col("directive") === "user-agent")
      .withColumn("grp", sum(
        when(col("_ua") && !coalesce(lag(col("_ua"), 1).over(w), lit(false)), 1L)
          .otherwise(0L)).over(w))
  }

  /** Group selection (§2.2.1): the agent's own groups when any exist
    * for the host, else the `*` groups; all selected groups merge. */
  private def applicableGroups(grouped: DataFrame, agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val uaRows = grouped.filter(col("_ua") && col("value") =!= "")
      .select(col("host"), col("grp"), lower(col("value")).as("ua"))
    val specific = uaRows.filter(col("ua") === agentLc)
      .select("host", "grp").distinct()
    val star = uaRows.filter(col("ua") === "*")
      .select("host", "grp").distinct()
    if (agentLc == "*") star
    else specific.unionByName(
      star.join(specific.select("host").distinct(), Seq("host"), "left_anti"))
  }

  /** Sitemap declarations: `(host, sitemap)` — RFC 9309 §2.2.4
    * "other records": group-INDEPENDENT (a Sitemap line applies to
    * everyone, wherever it sits in the file, including before any
    * User-agent line), URL case preserved. */
  def sitemapsOf(warc: DataFrame): DataFrame =
    groupedLines(warc)
      .filter(col("directive") === "sitemap" && col("value") =!= "")
      .select(col("host"), col("value").as("sitemap")).distinct()

  /** De-facto `Crawl-delay` (not in RFC 9309, honored by most
    * crawlers): `(host, crawl_delay)` seconds for the groups `agent`
    * obeys — group-SCOPED like allow/disallow, the most conservative
    * (largest) value wins when selected groups disagree; non-numeric
    * values are dropped. */
  def crawlDelaysOf(warc: DataFrame, agent: String = "*"): DataFrame = {
    val grouped = groupedLines(warc)
    grouped
      .filter(col("directive") === "crawl-delay" && col("grp") >= 1)
      .withColumn("_d", col("value").cast(DoubleType))
      .filter(col("_d").isNotNull && col("_d") >= 0)
      .join(applicableGroups(grouped, agent), Seq("host", "grp"))
      .groupBy(col("host")).agg(max(col("_d")).as("crawl_delay"))
  }

  /** [[rulesOf]] straight from a crawl directory. */
  def rules(spark: SparkSession, path: String, agent: String = "*"): DataFrame =
    rulesOf(
      spark.read.format("graft.sources.WarcSource").option("path", path).load(),
      agent)

  /** Hosts with a successfully parsed (2xx, decodable) robots capture
    * in the frame — the KEY SET for [[mergeRules]]: a host whose new
    * robots.txt yields zero rules (allow-all) is still a capture, and
    * its old rules must still be erased. One row per host. */
  def capturedHosts(warc: DataFrame): DataFrame =
    warc
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        lower(pathOf(col("target_uri"))) === "/robots.txt")
      .withColumn("_deframed", graft.functions.HttpBody.httpTransferDecode(
        col("body"), lower(col("http_transfer_encoding"))))
      .withColumn("_raw", graft.functions.HttpBody.httpBodyDecode(
        col("_deframed"), lower(col("http_content_encoding"))))
      .select(hostOf(col("target_uri")).as("host"),
        graft.functions.CharsetDecode.charsetDecode(
          col("_raw"), lit("utf-8")).as("_txt"))
      .filter(col("host") =!= "" && col("_txt").isNotNull)
      .select(col("host")).distinct()

  /** Latest-capture-wins merge of freshly parsed rules into a
    * persisted per-host rule table: every host in `hosts` (the
    * capture key set, see [[capturedHosts]]) has ALL its old rules
    * replaced by its rows in `fresh` — a new robots.txt is a
    * statement about the whole host, including the rules it no longer
    * carries — and hosts absent from `hosts` keep theirs untouched.
    * The rewrite runs under the directory's rewrite lock with the
    * rename-away → rename-in → delete-old staged swap (never a
    * no-table window; a concurrent rewrite fails fast and the caller
    * decides — a curation stream lets the batch fail and replay,
    * because a silently skipped merge would LOSE the batch's robots
    * captures forever once the checkpoint advances). Re-merging the
    * same batch converges (idempotent given per-host replacement).
    *
    * Scale: each merge rewrites the whole table — right for per-host
    * rule tables (a few rows per host, MBs at millions of hosts). A
    * fleet-scale table would bucket by host hash and rewrite only
    * touched buckets; the layout leaves room (bucket column), the
    * code keeps the simple form. */
  def mergeRules(spark: SparkSession, fresh: DataFrame, hosts: DataFrame,
      rulesDir: String): Unit = {
    if (hosts.isEmpty) return
    val hp = new org.apache.hadoop.fs.Path(rulesDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.util.DirLock.withIndexLock(fs, rulesDir, "rewrite") {
      val staged = new org.apache.hadoop.fs.Path(rulesDir + ".merge")
      val old = new org.apache.hadoop.fs.Path(rulesDir + ".old")
      fs.delete(staged, true)
      fs.delete(old, true)
      val freshRows = fresh.select(col("host"), col("rule"), col("pattern"))
      val merged =
        if (fs.exists(hp))
          spark.read.parquet(rulesDir)
            .join(hosts.select(col("host")), Seq("host"), "left_anti")
            .unionByName(freshRows)
        else freshRows
      merged.coalesce(1).write.mode("overwrite").parquet(staged.toString)
      if (fs.exists(hp)) {
        if (!fs.rename(hp, old))
          throw new java.io.IOException(s"rules merge: cannot park $rulesDir")
      }
      if (!fs.rename(staged, hp)) {
        if (fs.exists(old) && !fs.rename(old, hp))
          throw new java.io.IOException(
            s"rules merge swap FAILED AND RESTORE FAILED: table parked at $old, " +
              s"merge at $staged — recover by renaming one to $rulesDir")
        throw new java.io.IOException(s"rename $staged to $rulesDir failed (table restored)")
      }
      fs.delete(old, true)
      spark.catalog.refreshByPath(rulesDir)
    }
  }

  /** The persisted rule table, or an empty one when nothing has been
    * merged yet (pages gate as ALLOWED until their host's robots
    * capture arrives — robots exclusion is opt-out, and a polite
    * fetcher fetches robots.txt before the host's pages anyway). */
  def loadRules(spark: SparkSession, rulesDir: String): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(rulesDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) spark.read.parquet(rulesDir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("host", StringType), StructField("rule", StringType),
        StructField("pattern", StringType))))
  }

  /** Gate pages against a parsed rule table: every input row keeps
    * its columns and gains `allowed` (boolean), `rule` and `pattern`
    * (the winning rule, null when nothing matched). Longest-match
    * precedence, `allow` wins length ties, no match / no rules ⇒
    * allowed.
    *
    * Verdicts are computed once per DISTINCT url against the
    * broadcast rule table, then joined back — the regex evaluation
    * never scales with page count, only with distinct urls. */
  def gate(pages: DataFrame, rulesDf: DataFrame, urlCol: String): DataFrame = {
    val urls = pages.select(col(urlCol).as("_url")).distinct()
      .select(col("_url"), hostOf(col("_url")).as("_host"), pathOf(col("_url")).as("_path"))
    val joined = urls.join(
      broadcast(rulesDf.select(col("host").as("_host"), col("rule"), col("pattern"))),
      Seq("_host"), "left")
    // best = max (pattern_len, is_allow, pattern, rule): longest
    // match first, allow over disallow on a tie, then a total order
    // so the REPORTED winning rule is deterministic even between
    // equal-length same-verdict patterns.
    val matched = when(
      col("pattern").isNotNull &&
        regexp_like(col("_path"), regexOf(col("pattern"))),
      struct(length(col("pattern")).as("len"),
        (col("rule") === "allow").as("is_allow"),
        col("pattern").as("pattern"), col("rule").as("rule")))
    val verdicts = joined
      .groupBy(col("_url"))
      .agg(max(matched).as("_best"))
      .select(col("_url"),
        coalesce(col("_best.is_allow"), lit(true)).as("allowed"),
        col("_best.rule").as("rule"),
        col("_best.pattern").as("pattern"))
    pages.join(verdicts, pages(urlCol) === verdicts("_url"), "left")
      .drop("_url")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }
}
