package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The crawl's link layer (beyond-reference): anchor outlinks out of
  * raw HTML, the host-level link graph they induce, and a
  * deterministic PageRank over that graph — the domain-quality prior
  * a training-data pipeline joins against its curation gates (the
  * CommonCrawl host-rank idea: pages from well-linked hosts are
  * retained preferentially; link spam farms sink).
  *
  * All three stages are relational and oracle-twinnable:
  *
  *  - [[outlinks]] extracts `<a href=…>` targets with regexes in the
  *    Java∩RE2 subset (no lookaround, inline `(?i)`/`(?s)` flags only)
  *    and resolves them against the page URL per RFC 3986 §5 — the
  *    absolute / scheme-relative / root-relative / path-relative
  *    cases, fragment dropped, non-fetchable schemes (`mailto:`,
  *    `javascript:`, `data:`, …) dropped, dot-segments removed by a
  *    bounded-pass rewrite (see [[normalizeDotSegments]]).
  *  - [[hostGraph]] aggregates links to `(src_host, dst_host,
  *    n_links, internal)` edges.
  *  - [[pageRank]] is INTEGER-scaled (ranks are int64 multiples of
  *    1e-12): every step is floor division and exact int64 addition,
  *    so the result is bit-identical on any engine and any partition
  *    order — no float-summation nondeterminism, which is what makes
  *    a hash-exact oracle gate (and reproducible curation decisions)
  *    possible for an iterative algorithm.
  *
  * Scale shape: extraction is a pure projection + one Generate per
  * page (no shuffle); the host graph is one hash aggregation keyed by
  * constant-width host pairs; PageRank shuffles on `node` each
  * iteration with lineage cut by an eager localCheckpoint per
  * iteration (the standard iterative-algorithm discipline — without
  * it the plan doubles per iteration). Node count enters as a single
  * bounded driver scalar; the per-iteration dangling mass stays in
  * the plan as a broadcast 1×1 aggregate, never a collect. */
object Links {

  private val WS = "[ \\t\\n\\x0B\\f\\r]"

  /** The five XML/HTML predefined character references, decoded in
    * the standard order (`&amp;` LAST, so `&amp;lt;` yields the
    * literal `&lt;` — single-pass semantics). Attribute values and
    * sitemap `<loc>` elements are where these live; full named-entity
    * breadth ([[graft.functions.HtmlEntities]]) belongs to visible
    * text, not URLs. Twin-mirrorable as the same replace chain. */
  def decodeBasicEntities(c: Column): Column = {
    val a = regexp_replace(c, "&lt;", "<")
    val b = regexp_replace(a, "&gt;", ">")
    val d = regexp_replace(b, "&quot;", "\"")
    val e = regexp_replace(d, "&#39;", "'")
    val f = regexp_replace(e, "&apos;", "'")
    regexp_replace(f, "&amp;", "&")
  }

  /** RFC 3986 §5.2.4 dot-segment removal as a bounded fixed-point
    * rewrite: each pass drops `.` segments, collapses one level of
    * `segment/..`, and clamps `..` above the root. `passes` bounds
    * the nesting depth handled exactly (deeper chains resolve
    * PARTIALLY — deterministic, both engines run the identical chain;
    * real crawl hrefs nest 1–2 levels). Operates on a PATH string
    * (must not see `://` — the authority's dots are not segments). */
  def normalizeDotSegments(p: Column, passes: Int = 5): Column = {
    var cur = p
    for (_ <- 1 to passes) {
      // runs of "." segments (incl. a trailing "/.") drop first so a
      // later "/x/../" never sees an interleaved "/./"
      val noDot = regexp_replace(cur, "(/\\.)+(/|$)", "/")
      // one level of "segment/.." per pass; leftmost-first in both
      // engines (the twin passes the 'g' flag, Spark replaces all)
      val noUp = regexp_replace(noDot, "/[^/]+/\\.\\.(/|$)", "/")
      // ".." above the root is removed, per the RFC's merge clamp
      cur = regexp_replace(noUp, "^(/\\.\\.)+(/|$)", "/")
    }
    when(cur === "", lit("/")).otherwise(cur)
  }

  private def attrOf(tag: Column, attr: String): Column = {
    val dq = s"(?i)$WS($attr$WS*=$WS*\"([^\"]*)\")"
    val sq = s"(?i)$WS($attr$WS*=$WS*'([^']*)')"
    val uq = s"(?i)$WS$attr$WS*=$WS*([^\"' \\t\\n\\x0B\\f\\r>][^ \\t\\n\\x0B\\f\\r>]*)"
    when(tag.rlike(dq), regexp_extract(tag, dq, 2))
      .when(tag.rlike(sq), regexp_extract(tag, sq, 2))
      .when(tag.rlike(uq), regexp_extract(tag, uq, 1))
      .otherwise(lit(""))
  }

  private def hrefOf(tag: Column): Column = attrOf(tag, "href")

  /** `rel` carries space-separated link types (HTML spec); nofollow
    * anywhere in the list means "no endorsement" — the flag PageRank
    * inputs must respect (a link farm's outlinks are all nofollow'd
    * by any sane host) while a fetch frontier usually still crawls
    * the target. Commas tolerated (a common authoring error). */
  private def relNofollow(tag: Column): Column =
    attrOf(tag, "rel").rlike("(?i)(^|[ \\t,])nofollow([ \\t,]|$)")

  /** One row per `<a href=…>` outlink: `(page_url, url)` with `url`
    * resolved absolute (http/https only). Duplicate links on a page
    * are KEPT — multiplicity is signal ([[hostGraph]] counts it);
    * `.distinct()` is one call away for callers who disagree.
    *
    * Heuristic boundary (documented, not hidden): anchors are found
    * by tag-level regex, so an `<a>` inside a commented-out block or
    * a CDATA island still counts, and an href spelled inside another
    * attribute's VALUE can shadow the real one on the same tag —
    * crawl-scale link extraction trades DOM fidelity for a
    * zero-parse projection, the standard trade (WAT extractors do
    * the same). Relative resolution follows RFC 3986 §5.2 with the
    * base taken from the page URL (no `<base href>` handling —
    * rare, and honoring it would need the same regex pass; noted).
    *
    * Staging: the anchor-tag Generate evaluates one
    * `regexp_extract_all` per page; everything per-TAG reads the
    * generated attribute, never re-touches the page body. Between
    * extraction and resolution sits the AGGREGATE BARRIER on the
    * (page, anchor-position) key — the r15 project-collapse device:
    * without it, the resolution tree (a when-chain over ~25 nested
    * regex calls) is substituted into every filter and into
    * `hostOf(url)` by collapse/pushdown, multiplying to a generated
    * method past janino's 64 KB limit (measured: the collapsed form
    * compiles to interpreted fallback — every row pays uncompiled
    * regex dispatch). The exchange carries only `(page_url, href)` —
    * tens of bytes per anchor against the KB body scan it fences —
    * and the final admission filter is phrased on the CHEAP staged
    * pieces (`_ref` prefix classes, base scheme/host), never on the
    * resolved `url` tree, so that tree is built exactly once per
    * anchor. */
  /** RFC 3986 §5.2 reference resolution, shared by [[outlinks]] and
    * [[redirects]]. `ref` and `baseUrl` MUST be plain attributes (or
    * trees cheap enough to duplicate): every piece below references
    * them several times and projection collapse inlines per
    * reference. Returns `(resolved, host, admitted)` where `admitted`
    * is equivalent to "resolved is http(s) with a nonempty host" but
    * phrased entirely on the cheap inputs — filtering on the resolved
    * tree itself would substitute it per condition (the janino-melt
    * lesson in [[outlinks]]). */
  private def resolveAgainst(ref: Column, baseUrl: Column): (Column, Column, Column) = {
    val scheme = lower(regexp_extract(baseUrl,
      "^([a-zA-Z][a-zA-Z0-9+.\\-]*)://", 1))
    val host = Robots.hostOf(baseUrl)
    val basePath = Robots.pathOf(baseUrl)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    val rpath = regexp_replace(ref, "(?s)\\?.*", "")
    val rquery = regexp_extract(ref, "(?s)\\?(.*)", 1)
    val outPath = normalizeDotSegments(
      when(ref.startsWith("/"), rpath)
        .when(rpath === "", basePath) // "?query"-only reference
        .otherwise(concat(baseDir, rpath)))
    val rebuilt = concat(scheme, lit("://"), host, outPath,
      when(rquery =!= "", concat(lit("?"), rquery)).otherwise(lit("")))
    val isAbs = ref.rlike("(?i)^https?://")
    val isScheme = ref.rlike("(?i)^[a-z][a-z0-9+.\\-]*:")
    val isProto = ref.startsWith("//")
    val resolved =
      when(isAbs, ref)
        .when(isScheme, lit(null).cast("string"))
        .when(isProto, concat(scheme, lit(":"), ref))
        .otherwise(rebuilt)
    val urlHost = when(isAbs, Robots.hostOf(ref))
      .when(isProto, lower(regexp_extract(ref, "^//([^/?#]+)", 1)))
      .otherwise(host)
    val admitted =
      (isAbs && Robots.hostOf(ref) =!= "") ||
      (isProto && ref.rlike("^//[^/?#]") && scheme.isin("http", "https")) ||
      (!isScheme && !isProto && scheme.isin("http", "https") && host =!= "")
    (resolved, urlHost, admitted)
  }

  def outlinks(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    outlinksImpl(df, urlCol, htmlCol, withText = false)

  /** [[outlinks]] plus the anchor's VISIBLE TEXT (`anchor_text`) —
    * the WAT-extractor signal weak supervision wants (anchor text ≈ a
    * human's label for the target page). The generator matches FULL
    * `<a …>…</a>` spans (non-greedy, so a nested/mis-nested anchor
    * closes at the first `</a>`), which means anchors missing their
    * closing tag are NOT emitted here (they are by [[outlinks]], which
    * only needs the opening tag) — the documented cost of wanting the
    * text. The same span matching CONSUMES nested anchors: in
    * `<a href=a><a href=b>t</a>`, the inner `<a href=b>` falls inside
    * the outer span (spans are non-overlapping) and its link is never
    * emitted, where [[outlinks]] emits both — a caller needing full
    * link RECALL should union with [[outlinks]] and use this frame
    * only for the text signal. Inner markup drops to spaces, entities
    * decode, whitespace collapses (the `stripHtml` conventions, NBSP
    * included). */
  def outlinksWithText(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    outlinksImpl(df, urlCol, htmlCol, withText = true)

  private def outlinksImpl(df: DataFrame, urlCol: String, htmlCol: String,
      withText: Boolean): DataFrame = {
    val gen = if (withText) s"(?is)<a$WS[^>]*>.*?</a>" else s"(?i)<a$WS[^>]*>"
    val exploded = df
      .select(monotonically_increasing_id().as("_pid"),
        col(urlCol).as("page_url"),
        posexplode(regexp_extract_all(col(htmlCol),
          lit(gen), lit(0))).as(Seq("_ln", "_span")))
      // cheap pre-shuffle prune on the span ATTRIBUTE (no alias to
      // substitute): anchors without an href never cross the exchange
      .filter(col("_span").rlike("(?i)href"))
    val tag = if (withText)
      regexp_extract(col("_span"), "(?is)^(<a[^>]*>)", 1) else col("_span")
    val atext0 = if (withText)
      regexp_extract(col("_span"), "(?is)^<a[^>]*>(.*)</a>$", 1) else lit("")
    val tagged = exploded.select(col("_pid"), col("_ln"), col("page_url"),
      hrefOf(tag).as("_href0"), relNofollow(tag).as("nofollow"),
      atext0.as("_atext0"))
    // the barrier: (_pid, _ln) is unique per anchor, so first() is
    // exact; aliases cannot inline through an aggregate
    val staged = tagged.groupBy(col("_pid"), col("_ln"))
      .agg(first(col("page_url")).as("page_url"),
        first(col("_href0")).as("_href0"),
        first(col("nofollow")).as("nofollow"),
        first(col("_atext0")).as("_atext0"))
    val href = decodeBasicEntities(trim(col("_href0")))
    // fragment references the same fetch — dropped before the
    // empty-ref check so "#top" never reaches resolution
    val withRef = staged
      .withColumn("_ref", regexp_replace(href, "(?s)#.*", ""))
      .filter(col("_ref") =!= "")
    // the link's host is emitted as its own column because EVERY
    // consumer needs it (host graph, robots gate, frontier), and
    // deriving it downstream as `hostOf(url)` would substitute the
    // whole resolution tree into the extract (measured: that collapse
    // alone pushed hostGraph's generated method past janino's limit)
    val (resolved, urlHost, admitted) = resolveAgainst(col("_ref"), col("page_url"))
    val out = withRef
      .filter(admitted)
    if (!withText)
      out.select(col("page_url"), resolved.as("url"), urlHost.as("url_host"),
        col("nofollow"))
    else {
      // stripHtml conventions on the inner span: nested tags to
      // spaces, entity decode, explicit whitespace class incl. NBSP
      val cleaned = trim(regexp_replace(
        decodeBasicEntities(regexp_replace(col("_atext0"), "<[^>]*>", " ")),
        "[ \\t\\n\\x0B\\f\\r\\x{00A0}]+", " "))
      out.select(col("page_url"), resolved.as("url"), urlHost.as("url_host"),
        col("nofollow"), cleaned.as("anchor_text"))
    }
  }

  /** Page-level robots META directives: adds boolean `noindex` /
    * `nofollow` columns from `<meta name=robots content=…>` tags —
    * the in-document half of the exclusion protocol ([[Robots.gate]]
    * is the robots.txt half): a noindex page must not enter a served
    * corpus, a nofollow page endorses none of its outlinks. Pure
    * projection — each flag is two `rlike`s over the body (the
    * attribute pair in either order, quoted or unquoted values,
    * value-list membership on a word boundary), no Generate, no
    * shuffle, no per-element lambdas. Bot-specific tags
    * (`name=googlebot`) are deliberately NOT honored — this engine is
    * not that bot; the X-Robots-Tag response header is the envelope's
    * job if ever needed (not surfaced today, documented). */
  def metaRobots(df: DataFrame, htmlCol: String): DataFrame = {
    def flag(f: String): Column = {
      val nv = "name" + WS + "*=" + WS + "*[\"']?robots[\"'> \\t\\n\\x0B\\f\\r]"
      val cv = s"content$WS*=$WS*[\"']?[^\"'>]*\\b$f\\b"
      col(htmlCol).rlike(s"(?is)<meta$WS[^>]*$nv[^>]*$cv") ||
        col(htmlCol).rlike(s"(?is)<meta$WS[^>]*$cv[^\"'>]*[\"']?[^>]*$nv")
    }
    df.withColumn("noindex", flag("noindex"))
      .withColumn("nofollow", flag("nofollow"))
  }

  /** Redirect edges out of a raw crawl: one row per 3xx response with
    * a `Location` header — `(from_url, to_url, to_host, http_status)`
    * with the target resolved like any reference (`Location` is
    * commonly relative despite RFC 7231's SHOULD; same RFC 3986
    * machinery as [[outlinks]], fragment dropped, non-http(s) targets
    * dropped). Pure projection off the envelope's `http_location`
    * column — no barrier needed: a record yields at most one edge, so
    * nothing fans out, and admission is phrased on the cheap pieces.
    * Redirect targets are fetch candidates (PlanCrawl unions them)
    * and the edges feed [[resolveRedirects]]' canonical map. */
  def redirects(warc: DataFrame): DataFrame = {
    val base = warc
      .filter(col("warc_type") === "response" &&
        col("http_status").between(300, 399) && col("http_location").isNotNull)
      .select(col("target_uri").as("page_url"), col("http_status"),
        trim(col("http_location")).as("_ref0"))
      .withColumn("_ref", regexp_replace(col("_ref0"), "(?s)#.*", ""))
      .filter(col("_ref") =!= "")
    val (resolved, toHost, admitted) = resolveAgainst(col("_ref"), col("page_url"))
    base.filter(admitted)
      .select(col("page_url").as("from_url"), resolved.as("to_url"),
        toHost.as("to_host"), col("http_status"))
  }

  /** Collapse redirect CHAINS to their final targets by pointer
    * doubling: the map composes with itself each round, so chains up
    * to `maxHops` resolve in ⌈log₂ maxHops⌉ self-joins — at 10⁸
    * redirect rows that is 3–4 shuffles, not maxHops of them. Output
    * `(from_url, final_url, hops, terminal)`; `terminal` is false
    * when `final_url` still redirects (a cycle, or a chain longer
    * than maxHops — both surface instead of looping forever; callers
    * drop or log them). A URL with several captured targets keeps the
    * lexicographically smallest (deterministic, and any choice is
    * honest when captures disagree). */
  def resolveRedirects(redirects: DataFrame, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1, "resolveRedirects: maxHops must be >= 1")
    val m = redirects.groupBy(col("from_url"))
      .agg(min(col("to_url")).as("to_url"))
      .localCheckpoint(true)
    var cur = m.select(col("from_url"), col("to_url").as("final_url"),
      lit(1L).as("hops"))
    var reach = 1
    while (reach < maxHops) {
      val hop = cur.select(col("from_url").as("_f"), col("final_url").as("_t"),
        col("hops").as("_h"))
      cur = cur.join(hop, cur("final_url") === hop("_f"), "left")
        .select(col("from_url"),
          coalesce(col("_t"), col("final_url")).as("final_url"),
          (col("hops") + coalesce(col("_h"), lit(0L))).as("hops"))
        .localCheckpoint(true)
      reach *= 2
    }
    val fin = m.select(col("from_url").as("_f"))
    cur.join(fin, cur("final_url") === fin("_f"), "left")
      .select(col("from_url"), col("final_url"), col("hops"),
        col("_f").isNull.as("terminal"))
  }

  /** [[outlinks]] straight off a raw crawl frame: rides
    * [[graft.sources.WarcSource.responseTextOf]]'s decode chain
    * (transfer-decode → content-decode → charset), so the regexes see
    * real text — link extraction needs the PRE-strip HTML, which is
    * why this cannot compose with `crawlTextOf`. */
  def outlinksOf(warc: DataFrame): DataFrame =
    outlinks(
      graft.sources.WarcSource.responseTextOf(warc).filter(col("html").isNotNull),
      "target_uri", "html")

  /** Host-level link graph: `(src_host, dst_host, n_links, internal)`
    * — one hash aggregation over constant-width keys (hosts, never
    * URL or body text, cross the shuffle). Self-host edges are kept
    * and flagged: internal linkage is navigation signal, and dropping
    * it here would force re-extraction when someone wants it. A
    * `url_host` column (what [[outlinks]] emits) is used when present
    * — re-deriving it as `hostOf(url)` over outlinks' output would
    * substitute the resolution tree into the extract (janino-melting,
    * see [[outlinks]]). */
  def hostGraph(links: DataFrame,
      pageCol: String = "page_url", linkCol: String = "url"): DataFrame =
    links
      .select(Robots.hostOf(col(pageCol)).as("src_host"),
        (if (links.columns.contains("url_host")) col("url_host")
         else Robots.hostOf(col(linkCol))).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
      .withColumn("internal", col("src_host") === col("dst_host"))

  /** High-traffic two-level public suffixes (the co.uk class) — the
    * LAST-RESORT fallback model, used only when the vendored PSL
    * resource ([[Psl.Default]]) is absent from the jar (a stripped
    * repackaging). The real default since r16 is the full PSL
    * algorithm over `graft/public_suffix_list.dat` (wildcards,
    * exceptions, private registries, >2-level suffixes); this table
    * survives for that fallback and for callers who explicitly want
    * the old two-level behavior. Its failure mode is over-grouping
    * (a.github.io and b.github.io merge) — documented, never silent
    * data loss, but wrong exactly where per-domain curation matters
    * most, which is why the PSL replaced it as the default. */
  val DefaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.mx", "com.ar", "com.cl", "com.co", "com.pe", "com.ve",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "ac.in",
    "co.kr", "or.kr", "ac.kr",
    "com.tw", "org.tw", "com.hk", "com.sg", "com.my",
    "co.za", "org.za", "com.tr", "com.ua", "co.il", "org.il",
    "com.pl", "net.pl", "org.pl",
    "co.th", "com.vn", "com.ph", "com.eg", "com.sa", "com.ng")

  /** Registered domain (eTLD+1) of a host under the vendored Public
    * Suffix List snapshot ([[Psl.Default]]; falls back to the
    * [[DefaultMultiSuffixes]] two-level model only when the resource
    * is absent from the jar). This is the grouping key domain-level
    * curation wants ([[Corpus.curateByDomain]], blocklists,
    * per-domain boilerplate): `sub.a.example.co.uk` and
    * `www.example.co.uk` must land in ONE bucket, and — the part the
    * two-level model got WRONG — `a.github.io` and `b.github.io`
    * must land in DIFFERENT ones (github.io is a private-registry
    * public suffix: its subdomains are unrelated sites). */
  def registeredDomain(host: Column): Column =
    Psl.Default match {
      case Some(rules) => registeredDomain(host, rules)
      case None => registeredDomain(host, DefaultMultiSuffixes)
    }

  /** [[registeredDomain]] under an explicit PSL rule set — the full
    * publicsuffix.org algorithm: port stripped, lowercased; IPv4
    * literals pass whole (an IP has no registrar); the prevailing
    * rule is the matching EXCEPTION if any, else the LONGEST matching
    * exact/wildcard rule, else the implicit `*` (bare TLD); the
    * registered domain keeps one label more than the prevailing
    * public suffix. A host that IS a public suffix (or shorter)
    * passes through whole. Pure scalar expression: the rule sets
    * compile to `isin` hash-set probes per label depth — no join, no
    * shuffle, safe as a grouping key at any scale.
    *
    * Evaluation shape (r16, twice revised): the first spelling — the
    * rule chain composed directly over `split(host)` — melted janino
    * (the chain's ~30 references sit in CONDITIONAL when-branches,
    * which codegen's subexpression elimination refuses to hoist, so
    * each reference re-inlined the caller's full host-derivation
    * regex chain: 185 regex matchers in q134's plan, 64 KB exceeded,
    * whole stage interpreted). The lambda-bound rescue fixed the
    * melt but ran the chain interpreted at ~100 µs/row (+80% on
    * q134). The production form is now the NATIVE codegen'd
    * [[graft.functions.PslDomain]] expression — one generated static
    * call over pre-compiled hash sets; the composed chain survives
    * as [[registeredDomainExpr]], the compositional reference the
    * spec asserts row-identity against (the LshProbe /
    * multiProbePredicate precedent). */
  def registeredDomain(host: Column, rules: Psl.Rules): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PslDomain(
      ColumnBridge.expression(host), rules.compiled))
  }

  /** The composed-Column PSL chain — the compositional REFERENCE for
    * [[registeredDomain]]'s native expression (spec-compared
    * row-identical), not the production path: see the shape note
    * above. The label array binds once as a single-element
    * `transform` lambda variable so the chain never re-inlines a
    * caller's derivation tree. */
  def registeredDomainExpr(host: Column, rules: Psl.Rules): Column = {
    val h0 = lower(regexp_replace(host, ":\\d+$", ""))
    element_at(
      transform(array(split(h0, "\\.")), p => regDomainFromParts(p, rules)),
      1)
  }

  /** The PSL rule chain over an already-bound label array — every
    * reference here is to the lambda variable `parts` (cheap), never
    * to a derivation tree. See [[registeredDomainExpr]]. */
  private def regDomainFromParts(parts: Column, rules: Psl.Rules): Column = {
    val h = array_join(parts, ".")
    val n = size(parts)
    def lastK(k: Int): Column =
      if (k == 1) element_at(parts, -1)
      else concat_ws(".", (k to 1 by -1).map(i => element_at(parts, -i)): _*)
    // exception rules first (they beat every other match), longest
    // first within each kind; then exact/wildcard longest-first;
    // otherwise the implicit "*" rule (psLen = 1)
    val excBranches = rules.exceptions.toSeq.filter(_._2.nonEmpty)
      .sortBy(-_._1).map { case (k, set) =>
        ((n >= k) && lastK(k).isin(set.toSeq.sorted: _*), lit(k - 1))
      }
    val matchKs = (rules.exact.filter(_._2.nonEmpty).keys ++
      rules.wildcard.filter(_._2.nonEmpty).keys.map(_ + 1))
      .toSeq.distinct.filter(_ >= 2).sorted.reverse
    val matchBranches = matchKs.map { k =>
      val ex = rules.exact.get(k).filter(_.nonEmpty)
        .map(s => lastK(k).isin(s.toSeq.sorted: _*))
      val wc = rules.wildcard.get(k - 1).filter(_.nonEmpty)
        .map(s => lastK(k - 1).isin(s.toSeq.sorted: _*))
      ((n >= k) && (ex.toSeq ++ wc.toSeq).reduce(_ || _), lit(k))
    }
    val branches = excBranches ++ matchBranches
    val psLen =
      if (branches.isEmpty) lit(1)
      else branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
        case (acc, (c, v)) => acc.when(c, v)
      }.otherwise(lit(1))
    val regLen = psLen + lit(1)
    val reg = array_join(slice(parts, lit(0) - regLen, regLen), ".")
    when(h.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"), h)
      .when(n <= psLen, h)
      .otherwise(reg)
  }

  /** [[registeredDomain]] under the legacy two-level suffix TABLE —
    * the no-resource fallback model: hosts whose last two labels form
    * a listed multi-level suffix keep three labels, everything else
    * keeps two. Callers with a vendored PSL should prefer the
    * [[Psl.Rules]] overload (wildcards, exceptions, private
    * registries, >2-level suffixes). */
  def registeredDomain(host: Column, multiSuffixes: Seq[String]): Column = {
    val h = lower(regexp_replace(host, ":\\d+$", ""))
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(h.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"), h)
      .when(n <= lit(2), h)
      .when(last2.isin(multiSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Domain blocklist/allowlist gate: keep rows whose REGISTERED
    * domain (of the URL's host) is absent from `domains` (`deny`,
    * default) or present in it (`allow`). `domains` is a 1-column
    * frame of registered domains — broadcast-joined (blocklists are
    * thousands to low millions of rows: small against the corpus, and
    * the join key is the constant-width domain, never the URL). Build
    * `domains` with the SAME suffix table this gate uses, or co.uk
    * entries will silently miss. */
  def gateByDomain(df: DataFrame, urlCol: String, domains: DataFrame,
      mode: String = "deny"): DataFrame =
    gateByDomainKeyed(df, urlCol, domains, mode,
      registeredDomain(Robots.hostOf(col(urlCol))))

  /** [[gateByDomain]] under an explicit legacy suffix table (see the
    * [[registeredDomain]] table overload). */
  def gateByDomain(df: DataFrame, urlCol: String, domains: DataFrame,
      mode: String, multiSuffixes: Seq[String]): DataFrame =
    gateByDomainKeyed(df, urlCol, domains, mode,
      registeredDomain(Robots.hostOf(col(urlCol)), multiSuffixes))

  private def gateByDomainKeyed(df: DataFrame, urlCol: String,
      domains: DataFrame, mode: String, key: Column): DataFrame = {
    require(mode == "deny" || mode == "allow", s"gateByDomain: bad mode $mode")
    val keyed = df.withColumn("_rdom", key)
    val list = broadcast(
      domains.toDF("_rdom").select(lower(col("_rdom")).as("_rdom")).distinct())
    val joined =
      if (mode == "deny") keyed.join(list, Seq("_rdom"), "left_anti")
      else keyed.join(list, Seq("_rdom"), "left_semi")
    joined.drop("_rdom")
  }

  /** Exact floor division on nonnegative int64 columns.
    * `(a − a mod b)` is an exact multiple of b; both operands and the
    * quotient stay below 2^53 for every value this file produces
    * (max is 85×SCALE ≈ 8.5e13), so the double division is exact and
    * the cast back is lossless. Mirrors DuckDB's integer `//`. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast(LongType)

  /** Deterministic PageRank over a directed edge list — ranks are
    * int64 in units of 1e-12 ("micromillionths"), every arithmetic
    * step floor-division or exact addition:
    *
    *   rank₀(v)   = SCALE / N
    *   rankᵢ₊₁(v) = (15·SCALE)/(100·N)
    *              + (85 · (Σ_{u→v} rankᵢ(u)/out(u) + dangling/N)) / 100
    *
    * (damping 0.85 as the rational 85/100; `dangling` = the summed
    * rank of zero-out-degree nodes, redistributed uniformly — the
    * standard correction, computed as a broadcast 1×1 aggregate).
    * Floor rounding leaks ≤1 unit (10⁻¹²) per node per step — an
    * acceptable, deterministic bias that buys bit-identical results
    * across engines, partition counts and row orders; float PageRank
    * has none of those properties (float sums are order-dependent),
    * which is why every "reproducible" float implementation quietly
    * isn't.
    *
    * Self-loops are dropped and edges deduplicated (simple-graph
    * PageRank). `N` lands as one bounded driver scalar (a count of
    * HOSTS, not pages). Each iteration is two shuffles (contribution
    * aggregate + rank join), both keyed on `node`; the eager
    * per-iteration localCheckpoint truncates lineage so iteration k
    * never replans iterations 1..k-1.
    *
    * WEIGHTED variant (r16): pass `weightCol` — duplicate
    * `(src, dst)` pairs SUM their weights (so [[hostGraph]]'s
    * `n_links` feeds straight in), out-degree becomes the weighted
    * sum, and u's contribution to v is `(rank·w) // W(u)`, computed
    * as the exact identity `w·(rank // W) + ((rank mod W)·w) // W`
    * so every floor DIVISION keeps its operands under 2^53 (the
    * [[idiv]] exactness bound; the int64 multiplication is exact up
    * to 2^63). Residual bound, documented not guarded:
    * `W(u) · max(w)` must stay below 2^53 — a host needs ~10^8
    * weighted out-links AND a single 10^8-multiplicity edge to
    * break it. Rows with null or non-positive weight drop (a
    * zero-weight edge is a non-edge; refusing the whole frame for
    * one would kill crawl-scale runs on a single bad row). Weights
    * of 1 reproduce the unweighted ranks bit-for-bit (the identity's
    * second term vanishes: rank mod W < W). */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = 1000000000000L,
      weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    val edges = (weightCol match {
      case None =>
        edges0
          .select(col(srcCol).cast("string").as("src"),
            col(dstCol).cast("string").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .withColumn("w", lit(1L))
      case Some(wc) =>
        edges0
          .select(col(srcCol).cast("string").as("src"),
            col(dstCol).cast("string").as("dst"),
            col(wc).cast(LongType).as("w"))
          .filter(col("src") =!= col("dst") && col("w") > 0)
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    }).localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("deg"))
      .localCheckpoint(true)
    val base = (15L * scale) / (100L * n)
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iterations) {
      val dangling = ranks
        .join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("_dang"))
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(outdeg, "src")
        // (rank·w) // deg via the overflow-safe identity (scaladoc);
        // w = 1 reduces to rank // deg exactly
        .select(col("dst").as("node"),
          (col("w") * idiv(col("rank"), col("deg")) +
            idiv(pmod(col("rank"), col("deg")) * col("w"), col("deg"))).as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(base) + idiv(lit(85L) * (coalesce(col("_s"), lit(0L)) +
            idiv(col("_dang"), lit(n))), lit(100L))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
