package graft

import graft.operators.{Links, Psl}
import org.apache.spark.sql.functions._

class PslSpec extends SparkSpec {
  import spark.implicits._

  private def regOf(hosts: Seq[String], rules: Option[Psl.Rules] = None): Map[String, String] = {
    val df = hosts.toDF("host")
    val c = rules match {
      case Some(r) => Links.registeredDomain(col("host"), r)
      case None => Links.registeredDomain(col("host"))
    }
    df.select(col("host"), c.as("reg")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("parse: comments, sections, whitespace, rule kinds, lowering") {
    val rules = Psl.parse(
      """// comment line
        |
        |// ===BEGIN ICANN DOMAINS===
        |com
        |CO.UK
        |*.ck
        |!www.ck
        |pvt.k12.ma.us
        |github.io   trailing junk ignored per PSL spec
        |// ===END ICANN DOMAINS===
        |""".stripMargin.linesIterator)
    assert(rules.exact(2) === Set("co.uk", "github.io"))
    assert(rules.exact(1) === Set("com"))
    assert(rules.exact(4) === Set("pvt.k12.ma.us"))
    assert(rules.wildcard(1) === Set("ck"))
    assert(rules.exceptions(2) === Set("www.ck"))
    assert(rules.maxMatch === 4)
    // a wildcard anywhere but leftmost refuses loudly
    intercept[IllegalArgumentException] {
      Psl.parse(Iterator("foo.*.bar"))
    }
  }

  test("a 1-label exception rule yields psLen 0 on both forms (native sentinel edge)") {
    // not in the real PSL (exceptions always counter a wildcard) but
    // the algorithm must not confuse "psLen = 0" with "no match"
    val rules = Psl.parse(Iterator("*.zz", "!zz"))
    val got = Seq("zz", "a.zz", "b.a.zz").toDF("h")
      .select(col("h"), Links.registeredDomain(col("h"), rules).as("native"),
        Links.registeredDomainExpr(col("h"), rules).as("ref"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    // !zz: psLen = 0, regLen = 1 -> every host keeps its last label;
    // native and reference must agree (the 0-vs-unset sentinel edge)
    for ((h, (n, ref)) <- got) {
      assert(n === ref, s"host $h")
      assert(n === "zz", s"host $h")
    }
  }

  test("native PslDomain is row-identical to the composed reference chain") {
    val rules = Psl.Default.get
    val hosts = Seq(
      "example.com", "a.b.example.com", "EXAMPLE.COM:8080",
      "www.example.co.uk", "deep.sub.example.co.uk",
      "school.example.pvt.k12.ma.us",
      "a.github.io", "x.a.github.io", "github.io",
      "x.thing.ck", "thing.ck", "www.ck", "sub.www.ck", "ck",
      "vm1.uswest.compute.amazonaws.com",
      "cdn.site.fancy", "site.fancy", "fancy",
      "co.uk", "localhost", "localhost:8080",
      "192.168.0.1", "192.168.0.1:80", "256.1.2.3.4",
      "a..b.example.com", "", "a:bc", "host:", "host:80x",
      "trailing.dot.example.com.")
    val df = hosts.toDF("h")
    val got = df.select(col("h"),
      Links.registeredDomain(col("h"), rules).as("native"),
      Links.registeredDomainExpr(col("h"), rules).as("ref")).collect()
    for (r <- got)
      assert(r.getString(1) === r.getString(2), s"host '${r.getString(0)}'")
    // null propagates on both
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("i", "h")
      .select(Links.registeredDomain(col("h"), rules).as("n"),
        Links.registeredDomainExpr(col("h"), rules).as("r")).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("IDN rules register both forms: punycode hosts match unicode PSL entries (r16)") {
    // the full PSL writes 中国 / рф in unicode; crawl hosts arrive as
    // xn--fiqs8s / xn--p1ai — both spellings must resolve
    val rules = Psl.parse(Iterator("中国", "com.中国", "рф"))
    assert(rules.exact(1).contains("xn--fiqs8s"))
    assert(rules.exact(1).contains("中国"))
    assert(rules.exact(2).contains("com.xn--fiqs8s"))
    val got = regOf(Seq("www.site.com.xn--fiqs8s", "sub.site.xn--p1ai"),
      Some(rules))
    assert(got("www.site.com.xn--fiqs8s") === "site.com.xn--fiqs8s")
    assert(got("sub.site.xn--p1ai") === "site.xn--p1ai")
  }

  test("the vendored snapshot loads and is substantive") {
    val r = Psl.Default.getOrElse(fail("snapshot resource missing"))
    assert(r.nRules > 400)
    assert(r.exact(2).contains("co.uk"))
    assert(r.exact(2).contains("github.io"))
    assert(r.wildcard(1).contains("ck"))
    assert(r.exceptions(2).contains("www.ck"))
    assert(r.exact(4).contains("pvt.k12.ma.us"))
    assert(r.wildcard(3).contains("compute.amazonaws.com"))
  }

  test("snapshot-date marker is parsed and pinned (r18): refreshing the file must update this pin") {
    // the staleness instrument: Rules.snapshotDate comes from the
    // vendored header; Psl.Default warns on stderr past
    // StaleAfterMonths. Pinning the exact date here makes any data
    // refresh LOUD — the new file's date won't match until this
    // assertion (and the header scan it exercises) is updated too.
    val r = Psl.Default.get
    assert(r.snapshotDate === Some(java.time.LocalDate.of(2023, 2, 9)))
    // both marker shapes parse; a dateless file yields None
    assert(Psl.parse(Iterator("// VERSION: 2026-01-31", "co.zz"))
      .snapshotDate === Some(java.time.LocalDate.of(2026, 1, 31)))
    assert(Psl.parse(Iterator("// distribution snapshot dated 2024-06-01", "co.zz"))
      .snapshotDate === Some(java.time.LocalDate.of(2024, 6, 1)))
    assert(Psl.parse(Iterator("co.zz")).snapshotDate === None)
  }

  test("the snapshot is the FULL publicsuffix.org list (r17): thousands of rules, subset-absent registries resolve") {
    val r = Psl.Default.get
    // the full 2023-02-09 snapshot parses to ~9.5k rules before IDN
    // dual-form expansion; the old curated subset had ~700 — a floor
    // of 5000 catches any regression back to a partial file
    assert(r.nRules > 5000, s"nRules=${r.nRules}: not the full PSL")
    // registries the curated subset LACKED: under the subset these
    // fell to the implicit * rule and over-grouped into the bare TLD
    assert(r.exact(2).contains("co.mw"))
    assert(r.exact(2).contains("gov.bf"))
    assert(r.exact(2).contains("edu.krd"))
    assert(r.exact(1).contains("aero"))
    val got = regOf(Seq("news.paper.co.mw", "x.ministry.gov.bf"))
    assert(got("news.paper.co.mw") === "paper.co.mw")
    assert(got("x.ministry.gov.bf") === "ministry.gov.bf")
    // IDN rules arrive in unicode and must probe in punycode too:
    // ．рф is in the list as unicode; xn--p1ai is its punycode form
    assert(r.exact(1).contains("xn--p1ai"))
    // one-time parse+compile cost stays start-up-noise sized even on
    // the full file (measured ~100-300 ms; asserted loosely so a
    // pathological regression — quadratic set rebuilds, per-rule
    // regex — fails the suite rather than taxing every executor)
    val t0 = System.nanoTime()
    val fresh = Psl.load().get
    val parseMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    fresh.compiled
    val compileMs = (System.nanoTime() - t1) / 1e6
    info(f"full-PSL parse ${parseMs}%.0f ms, compile ${compileMs}%.0f ms")
    assert(parseMs < 5000 && compileMs < 5000)
  }

  test("registeredDomain: the PSL algorithm end-to-end on the snapshot") {
    val got = regOf(Seq(
      // plain gTLD
      "example.com", "a.b.example.com", "EXAMPLE.COM:8080",
      // ICANN 2-level
      "www.example.co.uk", "deep.sub.example.co.uk",
      // 4-label exact rule
      "school.example.pvt.k12.ma.us",
      // private registry: tenants are separate sites
      "a.github.io", "b.github.io", "x.a.github.io",
      // wildcard *.ck: every child of ck is a public suffix
      "x.thing.ck", "thing.ck",
      // exception !www.ck beats the wildcard
      "www.ck", "sub.www.ck",
      // deep wildcard *.compute.amazonaws.com
      "vm1.uswest.compute.amazonaws.com",
      // unknown TLD: implicit * rule
      "cdn.site.fancy", "site.fancy",
      // host IS a public suffix → passes whole
      "co.uk", "github.io",
      // IP literal
      "192.168.0.1:8080"))
    assert(got("example.com") === "example.com")
    assert(got("a.b.example.com") === "example.com")
    assert(got("EXAMPLE.COM:8080") === "example.com")
    assert(got("www.example.co.uk") === "example.co.uk")
    assert(got("deep.sub.example.co.uk") === "example.co.uk")
    assert(got("school.example.pvt.k12.ma.us") === "example.pvt.k12.ma.us")
    assert(got("a.github.io") === "a.github.io")
    assert(got("b.github.io") === "b.github.io")
    assert(got("x.a.github.io") === "a.github.io")
    assert(got("x.thing.ck") === "x.thing.ck")
    assert(got("thing.ck") === "thing.ck") // thing.ck IS a public suffix
    assert(got("www.ck") === "www.ck") // exception: registrable
    assert(got("sub.www.ck") === "www.ck") // …and sub is ITS subdomain
    assert(got("vm1.uswest.compute.amazonaws.com") ===
      "vm1.uswest.compute.amazonaws.com")
    assert(got("cdn.site.fancy") === "site.fancy")
    assert(got("site.fancy") === "site.fancy")
    assert(got("co.uk") === "co.uk")
    assert(got("github.io") === "github.io")
    assert(got("192.168.0.1:8080") === "192.168.0.1")
  }

  test("longest match wins over a shorter rule; exception beats wildcard") {
    val rules = Psl.parse(Iterator("uk", "co.uk", "special.co.uk",
      "*.zz", "!ok.zz"))
    val got = regOf(Seq(
      "a.special.co.uk", // 3-label rule beats co.uk
      "a.plain.co.uk",
      "a.b.zz", "ok.zz", "sub.ok.zz"), Some(rules))
    assert(got("a.special.co.uk") === "a.special.co.uk")
    assert(got("a.plain.co.uk") === "plain.co.uk")
    assert(got("a.b.zz") === "a.b.zz")
    assert(got("ok.zz") === "ok.zz")
    assert(got("sub.ok.zz") === "ok.zz")
  }

  test("Corpus.domainOf rides the PSL: variants group, tenants split, null contract holds") {
    val urls = Seq(
      "https://www.site.example.com/p/1",
      "https://cdn.m.site.example.com:443/p/2",
      "https://crawler@site.example.com/p/3",
      "https://a.github.io/x",
      "https://b.github.io/y",
      "not a url").toDF("url")
    val got = urls.select(col("url"),
      graft.operators.Corpus.domainOf(col("url")).as("d")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://www.site.example.com/p/1") === "example.com")
    assert(got("https://cdn.m.site.example.com:443/p/2") === "example.com")
    assert(got("https://crawler@site.example.com/p/3") === "example.com")
    assert(got("https://a.github.io/x") === "a.github.io")
    assert(got("https://b.github.io/y") === "b.github.io")
    assert(got("not a url") === null)
  }
}
