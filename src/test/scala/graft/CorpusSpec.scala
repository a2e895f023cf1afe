package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus statistics and deterministic sampling operators. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("termFrequencies counts normalized whitespace tokens; empty docs vanish") {
    val tf = Corpus.termFrequencies(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(tf((1L, "the")) === 2L)
    assert(tf((1L, "cat")) === 1L)
    assert(tf((3L, "a")) === 2L)
    assert(!tf.keys.exists(_._1 == 4L)) // empty text contributes nothing
  }

  test("vocabulary and tfidf agree with driver-side math") {
    val tf = Corpus.termFrequencies(docs, "doc_id", "text")
    val vocab = Corpus.vocabulary(tf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(vocab("the") === ((2L, 3L)))  // docs 1,2; occurrences 2+1
    assert(vocab("cat") === ((2L, 2L)))
    assert(vocab("mat") === ((1L, 1L)))

    val n = 4L
    val got = Corpus.tfidf(tf, n)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(4))).toMap
    // tf * ln(N/df), computed independently here
    assert(got((1L, "the")) === 2.0 * math.log(4.0 / 2.0))
    assert(got((2L, "dog")) === 1.0 * math.log(4.0 / 2.0))
    assert(got((1L, "mat")) === 1.0 * math.log(4.0 / 1.0))
  }

  test("hashSample: deterministic, monotone in fraction, near-nominal rate") {
    val ids = spark.range(20000).toDF("id")
    val s20 = Corpus.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    val s20b = Corpus.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(s20 === s20b) // reproducible
    val s50 = Corpus.hashSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s50)) // nested by construction
    assert(math.abs(s20.size / 20000.0 - 0.2) < 0.02)
    assert(math.abs(s50.size / 20000.0 - 0.5) < 0.02)
    // a different seed draws a genuinely different sample
    val sSeed = Corpus.hashSample(ids, "id", 0.2, seed = 7).collect().map(_.getLong(0)).toSet
    assert(sSeed !== s20)
    // bounds
    assert(Corpus.hashSample(ids, "id", 0.0).count() === 0L)
    assert(Corpus.hashSample(ids, "id", 1.0).count() === 20000L)
    intercept[IllegalArgumentException](Corpus.hashSample(ids, "id", 1.5))
  }

  test("repetitionSignals: planted boilerplate scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),          // one token repeated
      (2L, "buy now buy now buy now buy now"),        // repeated bigram
      (3L, "the quick brown fox jumps over dogs"),    // all bigrams unique
      (4L, "solo")                                    // sub-bigram doc: no grams
    ).toDF("doc_id", "text")
    val got = Corpus.repetitionSignals(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 5 bigrams all "spam spam" → top covers 2*5/6 of tokens, all dup
    assert(got(1L).getAs[Long]("top_cnt") === 5L)
    assert(got(1L).getAs[Double]("top_gram_frac") === 10.0 / 6.0)
    assert(got(1L).getAs[Double]("dup_gram_frac") === 1.0)
    // doc 2: "buy now"×4, "now buy"×3 → top frac 8/8, dup frac 7/7
    assert(got(2L).getAs[Long]("top_cnt") === 4L)
    assert(got(2L).getAs[Double]("top_gram_frac") === 1.0)
    assert(got(2L).getAs[Double]("dup_gram_frac") === 1.0)
    // doc 3: every bigram unique
    assert(got(3L).getAs[Long]("top_cnt") === 1L)
    assert(got(3L).getAs[Double]("dup_gram_frac") === 0.0)
    // doc 4: shorter than n → no row (callers left-join)
    assert(!got.contains(4L))
  }

  test("contamination flags benchmark n-gram overlap, distinct-gram semantics") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),     // contains bench trigram "alpha beta gamma"
      (2L, "alpha beta gamma alpha beta gamma"), // same gram twice → still distinct-counted once
      (3L, "zeta eta theta iota")         // clean
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "alpha beta gamma zeta")).toDF("bid", "btext")
    val got = Corpus.contamination(corpus, "doc_id", "text", bench, "btext", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: grams {abg, bgd} → 1 hit of 2
    assert(got(1L) === ((2L, 1L, 0.5)))
    // doc 2: distinct grams {abg, bga, gab} → abg hits once despite 2 occurrences
    assert(got(2L)._2 === 1L)
    assert(got(2L)._1 === 3L)
    // doc 3: no overlap
    assert(got(3L) === ((4L - 2, 0L, 0.0)))
    // non-broadcast path agrees
    val shuffled = Corpus.contamination(corpus, "doc_id", "text", bench, "btext",
        n = 3, broadcastBench = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(shuffled === got)
  }

  test("PII redaction: classes, order, and counts over staged redactions") {
    import graft.functions.Text
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.co.uk or call +1-800-555-0199 from 192.168.0.1"),
      (2L, "two mails x@y.io and z@w.org; short phone 12-345 stays"),
      (3L, "no pii here, just 1234 and 5.6")
    ).toDF("id", "text")
    val got = Text.withPiiSignals(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Int]("n_emails") === 1)
    assert(got(1L).getAs[Int]("n_ips") === 1)
    assert(got(1L).getAs[Int]("n_phones") === 1)
    assert(got(1L).getAs[String]("redacted") ===
      "mail <EMAIL> or call <PHONE> from <IP>")
    assert(got(2L).getAs[Int]("n_emails") === 2)
    assert(got(2L).getAs[String]("redacted") ===
      "two mails <EMAIL> and <EMAIL>; short phone 12-345 stays")
    assert(got(3L).getAs[Int]("n_emails") === 0)
    assert(got(3L).getAs[Int]("n_ips") === 0)
    assert(got(3L).getAs[Int]("n_phones") === 0)
    assert(got(3L).getAs[String]("redacted") === "no pii here, just 1234 and 5.6")
    // separator coverage (dot/space/parens), the \b mid-ID guard, and
    // the documented space-separator recall tradeoff
    val more = Seq(
      (4L, "dial (555) 123-4567 or 555.123.4567 or 555 123 4567"),
      (5L, "order id 90210-555-123456 is not a phone"),
      (6L, "a population of 1 234 567 is phone-shaped (documented over-redaction)")
    ).toDF("id", "text")
    val got2 = Text.withPiiSignals(more, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got2(4L).getAs[Int]("n_phones") === 3)
    assert(got2(4L).getAs[String]("redacted") === "dial <PHONE> or <PHONE> or <PHONE>")
    assert(got2(5L).getAs[Int]("n_phones") === 0)
    assert(got2(5L).getAs[String]("redacted") === "order id 90210-555-123456 is not a phone")
    assert(got2(6L).getAs[Int]("n_phones") === 1)
  }

  test("stripHtml: tags, script/style bodies, entity order, whitespace collapse") {
    import graft.functions.Text
    val df = Seq(
      (1L, "<html><body><h1>Title</h1><p>Hello <b>world</b></p></body></html>"),
      (2L, "<script>if (a < b) { alert('x'); }</script>kept<style>.c{}</style>"),
      (3L, "a &amp;lt; b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;!"),
      (4L, "plain text, no markup"),
      (5L, "<p\nclass='multi\nline'>across</p><script>\nvar s = \"</p>\";\n</script>done")
    ).toDF("id", "html")
    val got = df.select($"id", Text.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "Title Hello world")
    assert(got(2L) === "kept") // script BODY dropped, not just the tags
    // single-pass decode: &amp;lt; → literal "&lt;", never "<"
    assert(got(3L) === "a &lt; b & c <tag> \"q\" 's' !")
    assert(got(4L) === "plain text, no markup")
    // dot-matches-newline spans multi-line elements; the "</p>" inside
    // the script string dies with the script body
    assert(got(5L) === "across done")
    // adversarial cases from review: a stray </style> inside a script
    // body must NOT close the script span (per-tag passes), and
    // custom elements merely PREFIXED by script/style are plain tags
    val adv = Seq(
      (6L, "keep<script>document.write(\"</style>\")</script>after"),
      (7L, "a<scriptlet>important</scriptlet>b"),
      (8L, "x<styled-box>visible</styled-box>y")
    ).toDF("id", "html")
    val gotAdv = adv.select($"id", Text.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotAdv(6L) === "keep after")
    assert(gotAdv(7L) === "a important b")
    assert(gotAdv(8L) === "x visible y")
    // HTML tag names are case-insensitive: a <SCRIPT>/<Style> element's
    // BODY must die with it, not leak once the generic pass eats the tags
    val cased = Seq(
      (9L,  "a<SCRIPT>leak();</SCRIPT>b"),
      (10L, "a<Style type=\"text/css\">.x{}</STYLE>b"),
      (11L, "a<ScRiPt\nsrc='x'>var q = 1;</sCrIpT>b")
    ).toDF("id", "html")
    val gotCased = cased.select($"id", Text.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotCased(9L) === "a b")
    assert(gotCased(10L) === "a b")
    assert(gotCased(11L) === "a b")
  }

  test("stripHtml r14: numeric + extended named entities decode; malformed refs pass through") {
    import graft.functions.Text
    val df = Seq(
      // named Latin-1 + punctuation: the non-English-web staples
      (1L, "caf&eacute; l&rsquo;&Eacute;t&eacute; &mdash; ok &hellip;"),
      // decimal and hex numeric refs, incl. a supplementary-plane char
      (2L, "r&#233;sum&#xE9; dash &#8212; clef &#x1D11E; euro &#8364;"),
      // nbsp decodes to U+00A0 and folds into the whitespace collapse
      (3L, "a&nbsp;&nbsp;b &nbsp; c"),
      // malformed/unknown refs stay literal (loud, never dropped):
      // empty, non-hex, out-of-range, surrogate, unknown name, bare &
      (4L, "&#; &#xZZ; &#1114112; &#xD800; &frobnicate; a & b"),
      // single-pass: double-encoded stays one level encoded
      (5L, "&amp;eacute; &amp;#233;"),
      // greek + symbols
      (6L, "&alpha;&beta;&gamma; &ne; &le; &infin; &trade;")
    ).toDF("id", "html")
    val got = df.select($"id", Text.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "café l’Été — ok …")
    assert(got(2L) === "résumé dash — clef 𝄞 euro €")
    assert(got(3L) === "a b c")
    assert(got(4L) === "&#; &#xZZ; &#1114112; &#xD800; &frobnicate; a & b")
    assert(got(5L) === "&eacute; &#233;")
    assert(got(6L) === "αβγ ≠ ≤ ∞ ™")
  }

  test("stripHtml r15: entity lookahead is bounded; ampersand floods decode linearly") {
    import graft.functions.Text
    // A ';' further than 32 chars from its '&' never forms an entity —
    // the '&' stays literal — while a real entity after the flood still
    // decodes. The decoder scans a capped window per '&' (ADVICE r14:
    // unbounded indexOf(';') made semicolon-poor pages O(n^2)).
    val farSemi = "&" + ("x" * 40) + "; tail &eacute;"
    val flood = ("& " * 5000) + "&amp; end"
    val df = Seq((1L, farSemi), (2L, flood)).toDF("id", "html")
    val got = df.select($"id", Text.stripHtml($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "&" + ("x" * 40) + "; tail é")
    assert(got(2L) === ("& " * 5000) + "& end")
  }

  test("canonicalUrl: case, ports, slashes, params, fragments; non-URLs pass through") {
    import graft.functions.Text
    val df = Seq(
      (1L, "HTTPS://Example.COM:443/a//b/c/?utm_source=x&b=2&a=1#frag"),
      (2L, "http://example.com:80/"),
      (3L, "http://example.com:8080/keep/port"),     // non-default port kept
      (4L, "https://h.io/p?utm_a=1&ref=r&fbclid=f"), // all params tracking → no '?'
      (5L, "ftp://Files.EXAMPLE.com:21/x/"),         // other scheme: port kept
      (6L, "not a url"),
      (7L, "")
    ).toDF("id", "url")
    val got = Text.withCanonicalUrl(df, "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) === "https://example.com/a/b/c?a=1&b=2")
    assert(got(2L) === "http://example.com/")
    assert(got(3L) === "http://example.com:8080/keep/port")
    assert(got(4L) === "https://h.io/p")
    assert(got(5L) === "ftp://files.example.com:21/x")
    assert(got(6L) === "not a url")
    assert(got(7L) === "")
    // canonicalization is idempotent
    val twice = Text.withCanonicalUrl(
      Text.withCanonicalUrl(df, "url").select($"id", $"canonical_url".as("url")), "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(twice === got)
  }

  test("canonicalUrl is idempotent and clean over generated URL space") {
    import graft.functions.Text
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "HTTP", "https", "HTTPS", "ftp")
    val hosts = Seq("Example.COM", "a.b.io", "X.Y.Z.org:8080", "h.io:443", "w.net:80")
    val paramPool = Seq("a=1", "utm_x=2", "ref=r", "b=3", "z=")
    def gen(): String = {
      val s = schemes(rnd.nextInt(schemes.length))
      val h = hosts(rnd.nextInt(hosts.length))
      val segs = (0 until rnd.nextInt(4)).map(_ => "s" + rnd.nextInt(10)).mkString("/")
      val p = (if (rnd.nextBoolean()) "//" else "/") + segs +
        (if (rnd.nextBoolean()) "/" else "")
      val params = (0 until rnd.nextInt(4)).map(_ => paramPool(rnd.nextInt(paramPool.length)))
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$s://$h$p$q" + (if (rnd.nextBoolean()) "#frag" else "")
    }
    val urls = (1 to 300).map(i => (i.toLong, gen())).toDF("id", "url")
    val once = Text.withCanonicalUrl(urls, "url").select($"id", $"canonical_url".as("url"))
    // fixed point after one pass
    assert(Text.withCanonicalUrl(once, "url")
      .filter($"url" =!= $"canonical_url").count() === 0L)
    // canonical space is clean: no fragments, no tracking params, no
    // doubled slashes inside the path
    assert(once.filter($"url".contains("#")
      || $"url".rlike("[?&](utm_|ref=)")
      || $"url".rlike("://[^/]*/[^?]*//")).count() === 0L)
  }

  test("compressionRatio separates repetitive text from prose; edge-safe") {
    import graft.functions.Text
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "violinists argued about quarterly budget allocations near the harbor. " +
      "Meanwhile a cartographer sketched improbable coastlines, and two " +
      "engineers debated whether the bridge tolerates resonance under wind."
    val df = Seq(
      (1L, "spam " * 200),          // heavy repetition
      (2L, prose),                  // natural-ish prose, no repeats
      (3L, ""),                     // empty → 0.0
      (4L, "x")                     // tiny: overhead dominates, ratio > 1
    ).toDF("id", "text")
    val got = df.select($"id", Text.compressionRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < 0.1, s"repetitive ratio ${got(1L)}")
    assert(got(2L) > 0.3 && got(2L) < 0.9, s"prose ratio ${got(2L)}")
    assert(got(3L) === 0.0)
    assert(got(4L) > 1.0)
    assert(got(1L) < got(2L))
    // null-safe through the expression
    val withNull = Seq((5L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Text.compressionRatio($"text").as("r")).collect()
    assert(withNull(0).isNullAt(0))
  }

  test("selectByBudget: greedy by score, crossing doc included, exact cutoff") {
    val df = Seq(
      (1L, 0.9, 100L), (2L, 0.8, 100L), (3L, 0.7, 100L), (4L, 0.6, 100L)
    ).toDF("id", "score", "n_tokens")
    def sel(b: Long) = Corpus.selectByBudget(df, "score", "n_tokens", "id", b)
      .collect().map(_.getLong(0)).toSet
    assert(sel(250L) === Set(1L, 2L, 3L)) // doc 3 crosses the 250 line → included
    assert(sel(200L) === Set(1L, 2L))     // exact boundary: cum before doc 3 is 200, not < 200
    assert(sel(1L) === Set(1L))           // always at least the best doc
    assert(sel(0L) === Set.empty)
    intercept[IllegalArgumentException](sel(-1L))
    // r10: the small-N contract is enforced, not advisory — an input
    // past maxRows fails fast with the scale path named, instead of
    // moving the corpus onto one partition
    val err = intercept[IllegalArgumentException](
      Corpus.selectByBudget(df, "score", "n_tokens", "id", 250L, maxRows = 3L))
    assert(err.getMessage.contains("selectByBudgetThreshold"))
    assert(err.getMessage.contains("4 rows"))
  }

  test("selectByBudgetThreshold equals the exact form across budgets, ties, and depths") {
    // 500 rows, heavily tied scores (97 distinct values) and varied
    // token weights — exercises tie groups inside and at the edge of
    // the crossing bin. Deterministic synthetic data (no RNG in specs).
    val rows = (1L to 500L).map { i =>
      val score = ((i * 37) % 97).toDouble / 7.0
      val tok = 1L + (i * 13) % 40
      (i, score, tok)
    }
    val df = rows.toDF("id", "score", "n_tokens")
    val total = rows.map(_._3).sum
    def ids(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.getLong(0)).toSet
    for (budget <- Seq(0L, 1L, 37L, 500L, total / 3, total / 2, total - 1, total, total + 1)) {
      val exact = ids(Corpus.selectByBudget(df, "score", "n_tokens", "id", budget))
      // tiny bins/exactTrimRows force multi-level refinement; also the
      // degenerate no-refinement path (exactTrimRows >= n)
      for ((b, etr) <- Seq((4, 4L), (16, 8L), (8, 1L), (4096, 1L << 16))) {
        val got = ids(Corpus.selectByBudgetThreshold(
          df, "score", "n_tokens", "id", budget, bins = b, exactTrimRows = etr))
        assert(got === exact, s"budget=$budget bins=$b exactTrimRows=$etr")
      }
    }
    // empty input
    val empty = df.filter(lit(false))
    assert(ids(Corpus.selectByBudgetThreshold(empty, "score", "n_tokens", "id", 10L)).isEmpty)
    intercept[IllegalArgumentException](
      Corpus.selectByBudgetThreshold(df, "score", "n_tokens", "id", -1L))
    // all scores identical: the irreducible tie group goes to the exact
    // trim in one step (lo == hi stops refinement immediately)
    val tied = (1L to 100L).map(i => (i, 1.0, 10L)).toDF("id", "score", "n_tokens")
    val exactTied = ids(Corpus.selectByBudget(tied, "score", "n_tokens", "id", 95L))
    assert(ids(Corpus.selectByBudgetThreshold(
      tied, "score", "n_tokens", "id", 95L, bins = 4, exactTrimRows = 1L)) === exactTied)
  }

  test("selectByBudgetThreshold fails loudly when the boundary set exceeds maxBoundaryRows") {
    // all-one-score corpus: the histogram cannot split the tie group
    // (lo == hi immediately), so the boundary set is the whole input —
    // with the knob below it, the guard must trip instead of silently
    // running the unpartitioned cumulative window over all rows
    val tied = (1L to 100L).map(i => (i, 1.0, 10L)).toDF("id", "score", "n_tokens")
    val e = intercept[IllegalArgumentException](
      Corpus.selectByBudgetThreshold(tied, "score", "n_tokens", "id", 95L,
        bins = 4, exactTrimRows = 1L, maxBoundaryRows = 10L).collect())
    assert(e.getMessage.contains("maxBoundaryRows"))
    assert(e.getMessage.contains("tie group"))
    // and a splittable corpus with the same knob refines below it fine
    val spread = (1L to 100L).map(i => (i, i.toDouble, 10L)).toDF("id", "score", "n_tokens")
    val got = Corpus.selectByBudgetThreshold(spread, "score", "n_tokens", "id", 95L,
      bins = 16, exactTrimRows = 4L, maxBoundaryRows = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(got === Corpus.selectByBudget(spread, "score", "n_tokens", "id", 95L)
      .collect().map(_.getLong(0)).toSet)
  }

  test("bigram LM: counts exact, perplexity matches driver math, junk scores high") {
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat saw the dog")
    ).toDF("id", "text")
    val model = Corpus.bigramModel(train, "text")
    val m = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("the", "cat")) === 2L)
    assert(m(("sat", "on")) === 2L)
    assert(m(("on", "the")) === 2L)
    // score: one fluent doc, one word-salad doc, one single-token doc
    val docs = Seq(
      (10L, "the cat sat on the floor"),
      (11L, "rug the on mat dog zzz"),
      (12L, "the")
    ).toDF("id", "text")
    val got = Corpus.lmScore(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r).toMap
    // driver math for doc 10: V = distinct tokens in model
    val vocab = m.keys.flatMap(p => Seq(p._1, p._2)).toSet
    val v = vocab.size.toLong
    val c1 = m.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val bi10 = Seq(("the", "cat"), ("cat", "sat"), ("sat", "on"), ("on", "the"), ("the", "floor"))
    val ll10 = bi10.map { p =>
      math.log((m.getOrElse(p, 0L) + 1.0) / (c1.getOrElse(p._1, 0L) + v.toDouble))
    }.sum
    assert(got(10L).getAs[Long]("n_bigrams") === 5L)
    assert(got(10L).getAs[Long]("n_oov") === 1L) // (the, floor) unseen
    assert(math.abs(got(10L).getAs[Double]("ll") - ll10) < 1e-12)
    assert(math.abs(got(10L).getAs[Double]("ppl") - math.exp(-ll10 / 5)) < 1e-12)
    // word salad: all-OOV, perplexity strictly higher
    assert(got(11L).getAs[Long]("n_oov") === 5L)
    assert(got(11L).getAs[Double]("ppl") > got(10L).getAs[Double]("ppl"))
    // single-token doc: no bigrams → no row
    assert(!got.contains(12L))
    // the shuffle-join path agrees with the broadcast path
    val shuffled = Corpus.lmScore(docs, "id", "text", model, broadcastModel = false)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(math.abs(shuffled(10L) - got(10L).getAs[Double]("ppl")) < 1e-12)
    intercept[IllegalArgumentException](
      Corpus.lmScore(docs, "id", "text", model, k = 0.0))
  }

  test("dedupLines: corpus-wide first occurrence wins, empties survive, counts exact") {
    val df = Seq(
      (1L, "COOKIE BANNER\nunique first doc\n\nshared footer"),
      (2L, "COOKIE BANNER\nunique second doc\n\nshared footer"),
      (3L, "repeated inside\nrepeated inside\nown line"),
      (4L, ""),                            // one empty line, kept
      (5L, null.asInstanceOf[String]),
      (6L, "COOKIE BANNER")                // nothing else left → empty doc
    ).toDF("id", "text")
    val got = Corpus.dedupLines(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[String]("text_deduped")),
          Option(r.getAs[Any]("n_lines")), Option(r.getAs[Any]("n_removed"))))).toMap
    // doc 1 is first everywhere: intact
    assert(got(1L)._1 === Some("COOKIE BANNER\nunique first doc\n\nshared footer"))
    assert(got(1L)._3 === Some(0))
    // doc 2 loses banner + footer, keeps its unique line and the empty
    assert(got(2L)._1 === Some("unique second doc\n"))
    assert(got(2L)._2 === Some(4))
    assert(got(2L)._3 === Some(2))
    // in-doc repetition: second copy removed
    assert(got(3L)._1 === Some("repeated inside\nown line"))
    assert(got(3L)._3 === Some(1))
    // empty text = one empty line, untouched
    assert(got(4L)._1 === Some(""))
    assert(got(4L)._2 === Some(1))
    assert(got(4L)._3 === Some(0))
    // null text → null through
    assert(got(5L)._1 === None && got(5L)._2 === None)
    // all lines removed → empty string, not null
    assert(got(6L)._1 === Some(""))
    assert(got(6L)._3 === Some(1))
  }

  test("mixSystematic applies per-stratum rates with a default") {
    val df = spark.range(60).selectExpr("id", "case when id % 2 = 0 then 'a' else 'b' end as s")
    val got = Corpus.mixSystematic(df, "s", "id", Map("a" -> 3), defaultEvery = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // stratum a = even ids (30 rows), every 3rd of them in order
    assert(got("a") === (0 until 30 by 3).map(_ * 2L))
    // stratum b = odd ids, default rate every 5th
    assert(got("b") === (0 until 30 by 5).map(i => i * 2L + 1))
    intercept[IllegalArgumentException](
      Corpus.mixSystematic(df, "s", "id", Map("a" -> 0)))
  }

  test("assignSplits: cluster-atomic labels, deterministic, proportional, validated") {
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    // every member of a cluster gets the SAME split — the leakage guarantee
    val clustered = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 77L),
      (5L, 77L), (6L, 6L)).toDF("id", "cluster")
    val out = Corpus.assignSplits(clustered, "cluster", fr)
    val perCluster = out.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perCluster.forall(_.getLong(1) === 1L))
    // labels come from the declared set and the assignment is
    // deterministic across evaluations
    val a = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val b = Corpus.assignSplits(clustered, "cluster", fr)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
    // proportions hold over many singleton clusters (each its own id)
    val singles = Corpus.assignSplits(
      spark.range(20000).select(col("id").as("cluster")), "cluster", fr)
    val counts = singles.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02, counts.toString)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02, counts.toString)
    assert(counts.values.sum === 20000L)
    // loud validation: empty, not summing to 1, duplicate names
    intercept[IllegalArgumentException](
      Corpus.assignSplits(clustered, "cluster", Seq.empty))
    intercept[IllegalArgumentException](
      Corpus.assignSplits(clustered, "cluster", Seq(("train", 0.5))))
    intercept[IllegalArgumentException](
      Corpus.assignSplits(clustered, "cluster",
        Seq(("train", 0.5), ("train", 0.5))))
  }

  test("systematicSample keeps every k-th row per stratum in order") {
    val df = spark.range(100).selectExpr("id", "case when id % 3 = 0 then 'a' else 'b' end as s")
    val got = Corpus.systematicSample(df, "s", "id", every = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // stratum a = ids 0,3,6,…,99 (34 rows) → rows 1,6,11,… of that order
    assert(got("a") === (0 until 34 by 5).map(i => i * 3L))
    // stratum b = the other 66 ids in order → every 5th of those
    val bIds = (0L until 100L).filter(_ % 3 != 0)
    assert(got("b") === (0 until 66 by 5).map(bIds))
    assert(got("a").size + got("b").size === 7 + 14)
  }

  test("knScore: interpolated Kneser–Ney — driver math, backoff chain, normalization") {
    val train = Seq(
      (0L, "the cat sat"), (2L, "the cat ran"), (4L, "a dog sat")
    ).toDF("doc_id", "text")
    val model = Corpus.bigramModel(train, "text")
    // model: (the,cat):2 (cat,sat):1 (cat,ran):1 (a,dog):1 (dog,sat):1
    // → B=5; ctx: the(c1=2,n1p=1) cat(2,2) a(1,1) dog(1,1);
    //   cont n1pl: cat=1 sat=2 ran=1 dog=1
    val D = 0.75; val B = 5.0; val unk = 1.0 / (B + 1)
    val r = Corpus.knScore(
        Seq((1L, "the cat sat zzz")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect()(0)
    // (the,cat) hit; (cat,sat) hit; (sat,zzz): 'sat' is no context →
    // Pcont(zzz) → zzz never a continuation → unk floor
    val p1 = (2 - D) / 2 + (D * 1 / 2) * (1 / B)
    val p2 = (1 - D) / 2 + (D * 2 / 2) * (2 / B)
    val p3 = unk
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Long]("n_ctx_hit") === 2L)
    assert(r.getAs[Long]("sum_c12") === 3L)
    assert(math.abs(r.getAs[Double]("min_p") - Seq(p1, p2, p3).min) < 1e-12)
    assert(math.abs(r.getAs[Double]("max_p") - Seq(p1, p2, p3).max) < 1e-12)
    val ll = math.log(p1) + math.log(p2) + math.log(p3)
    assert(math.abs(r.getAs[Double]("ll") - ll) < 1e-9)
    assert(math.abs(r.getAs[Double]("ppl") - math.exp(-ll / 3)) < 1e-9)
    // KN normalization: for a seen context, P sums to EXACTLY 1 over
    // the continuation vocabulary (the property that distinguishes a
    // real probability model from a heuristic score)
    val w2Vocab = Seq("cat", "sat", "ran", "dog")
    val probeDocs = w2Vocab.zipWithIndex
      .map { case (x, i) => (i.toLong, s"cat $x") }
      .toDF("doc_id", "text")
    val probs = Corpus.knScore(probeDocs, "doc_id", "text", model)
      .select($"min_p").collect().map(_.getDouble(0))
    assert(math.abs(probs.sum - 1.0) < 1e-12, s"sum=${probs.sum}")
  }

  test("nfc + fingerprintUnicode: canonical equivalence unifies, scripts preserved, ascii fast path (r16)") {
    import graft.functions.Text
    val rows = Seq(
      ("lat-c", "café"), ("lat-d", "café"),
      ("gr-c", "ελλάδα"),
      ("gr-d", "ελλάδα"),
      ("ascii", "plain text"), ("null", null))
      .toDF("k", "t")
    val got = rows.select(col("k"), Text.nfc(col("t")).as("n"),
      Text.fingerprintUnicode(col("t")).as("f")).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    // composed and decomposed collapse to one spelling and one print
    assert(got("lat-c")._1 === got("lat-d")._1)
    assert(got("lat-c")._2 === got("lat-d")._2)
    assert(got("gr-c")._2 === got("gr-d")._2)
    // the script itself is PRESERVED (not ascii-stripped): distinct
    // non-Latin texts keep distinct fingerprints
    assert(got("gr-c")._2 !== got("lat-c")._2)
    assert(got("ascii")._1 === Some("plain text"))
    assert(got("null") === ((None, None)))
    // the historical plain fingerprint SPLITS the Latin canonical
    // pair ("caf" vs "cafe" after the ascii strip) and ERASES Greek
    // entirely (md5 of "") — both failure modes fingerprintUnicode
    // exists to fix
    val plain = rows.filter(col("t").isNotNull)
      .select(col("k"), Text.fingerprint(col("t"))).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plain("lat-c") !== plain("lat-d"))
    assert(plain("gr-c") === plain("gr-d")) // equal because ERASED
    assert(plain("gr-c") === "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("shuffleShards: reproducible permutation, partition-invariant, seed-sensitive, dense seq (r16)") {
    val docs = (0L until 200L).map(i => (i, s"payload $i")).toDF("doc_id", "body")
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      Corpus.shuffleShards(df, "doc_id", seed, nShards = 8)
        .select("doc_id", "shard", "seq")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val a = run(docs, "v1")
    // byte-identical under a different physical partitioning
    assert(run(docs.repartition(13), "v1") === a)
    // a different seed is a genuinely different permutation
    assert(run(docs, "v2") !== a)
    // carried columns survive
    assert(Corpus.shuffleShards(docs, "doc_id", "v1", 8).columns.toSeq ===
      Seq("doc_id", "body", "shard", "seq"))
    // seq is dense 0..n-1 within every shard; shards cover the range
    val byShard = a.values.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet) && byShard.size > 1)
    for ((_, rows) <- byShard)
      assert(rows.map(_._2).toSeq.sorted === (0L until rows.size).toSeq)
  }

  test("domainOf: authority spellings collapse, non-URLs null") {
    val got = Seq(
      "https://www.Example.COM:443/p/1",
      "http://user:pw@example.com:80/x",
      "HTTPS://EXAMPLE.COM/y?q=1#f",
      "https://sub.example.com/z",
      "not a url",
      "")
      .toDF("url")
      .select(Corpus.domainOf($"url").as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0) === Some("example.com"))
    assert(got(1) === Some("example.com"))
    assert(got(2) === Some("example.com"))
    assert(got(3) === Some("example.com")) // eTLD+1 under the PSL (r16)
    assert(got(4) === None)
    assert(got(5) === None)
  }

  test("curateByDomain: dup flood drops, quality floor drops, small domains and null domains keep") {
    val prose = "The quick brown fox jumps over the lazy dog and then rests in the shade."
    val rows =
      // spam.com: 6 docs, 5 identical boilerplate → dup_frac > 0.5
      (1L to 6L).map(i => (i, s"https://spam.com/p/$i",
        if (i < 6) "identical boilerplate" else prose + i)) ++
      // junk.com: 6 distinct but degenerate bodies (pure punctuation
      // → qualityScore ~0) → mean quality below the floor
      (11L to 16L).map(i => (i, s"https://junk.com/p/$i", "!!!" * i.toInt)) ++
      // good.com: 6 distinct prose docs → survives both thresholds
      (21L to 26L).map(i => (i, s"https://good.com/p/$i", prose + i)) ++
      // tiny.com: 3 docs of pure boilerplate — would trip, but sits
      // under minDocs, so the small-domain guard keeps it
      (31L to 33L).map(i => (i, s"https://tiny.com/p/$i", "identical boilerplate")) ++
      // unparseable URL → null domain → keep
      Seq((41L, "nope", prose))
    val out = Corpus.curateByDomain(
        rows.toDF("doc_id", "url", "body"), "url", "body",
        minDocs = 5, maxDupFrac = 0.5, minMeanQuality = 0.2)
      .select($"doc_id", $"domain", $"keep")
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(2))).toMap
    for (i <- 1L to 6L) assert(out(i) === ((Some("spam.com"), false)), s"doc $i")
    for (i <- 11L to 16L) assert(out(i) === ((Some("junk.com"), false)), s"doc $i")
    for (i <- 21L to 26L) assert(out(i) === ((Some("good.com"), true)), s"doc $i")
    for (i <- 31L to 33L) assert(out(i) === ((Some("tiny.com"), true)), s"doc $i")
    assert(out(41L) === ((None, true)))
    // domainStats agrees on the aggregates driving those decisions
    val st = Corpus.domainStats(rows.toDF("doc_id", "url", "body"), "url", "body")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("dup_frac"))).toMap
    assert(st("spam.com")._1 === 6L)
    assert(st("spam.com")._2 > 0.5) // 5 of 6 share one md5
    assert(st("good.com")._2 === 0.0)
    assert(st("tiny.com") === ((3L, 1.0))) // corpus-wide mark: matches spam's boilerplate
    assert(!st.contains(null))
  }

  test("crawlHealth r15: bodyless eligible rows count in n_no_body, never decode_null or pages") {
    import graft.operators.Corpus
    // the WarcSource frame columns crawlHealthOf touches; bodies:
    // a real page, a zero-length body (what the envelope split yields
    // for a bodyless 2xx), a NULL body (foreign loader), and a
    // corrupt gzip-declared body (a genuine decode failure)
    def row(id: Long, body: Array[Byte], enc: String) =
      (id, "s0", "response", 200, "text/html; charset=UTF-8", enc,
        null.asInstanceOf[String], body)
    val df = Seq(
      row(1L, "<p>hello</p>".getBytes("UTF-8"), null),
      row(2L, Array.emptyByteArray, null),
      row(3L, null, null),
      row(4L, "not gzip at all".getBytes("UTF-8"), "gzip"),
      // r18: br decodes (vendored RFC 7932) — its own counter, a page
      row(5L, graft.functions.Brotli.compressStored(
        "<p>brotli page</p>".getBytes("UTF-8")), "br"),
      // corrupt br = decode failure, counted like the corrupt gzip
      row(6L, Array[Byte](0x6b, -1, -1), "br"),
      // compress keeps the refusal path exercised
      row(7L, "raw".getBytes("UTF-8"), "compress")
    ).toDF("id", "shard", "warc_type", "http_status", "http_content_type",
      "http_content_encoding", "http_transfer_encoding", "body")
    val h = Corpus.crawlHealthOf(df).collect()(0)
    def n(c: String) = h.getLong(h.fieldIndex(c))
    assert(n("n_records") === 7L)
    assert(n("n_eligible") === 7L)
    assert(n("n_no_body") === 2L)      // empty + null bodies
    assert(n("n_enc_br") === 2L)       // both br-declared rows
    assert(n("n_unsupported_encoding") === 1L) // compress only — br decodes now
    assert(n("n_decode_null") === 3L)  // corrupt gzip + corrupt br + compress
    assert(n("n_pages") === 2L)        // the real page + the br page
    assert(n("n_cs_declared") === 2L)  // provenance rides decoded rows only
  }

  test("removeBoilerplate: domain-frequent lines drop everywhere, small domains exempt, empties kept") {
    import spark.implicits._
    val nav = "nav home about"
    // big.example: 4 docs, nav in 3 (75% >= 50%) → dropped from ALL;
    // the 50%-frequency body line stays (2/4 >= 0.5 → dropped too —
    // assert the >= boundary); rare lines stay
    val docs = Seq(
      (1L, "http://www.big.example/a", s"$nav\nunique one\nshared half"),
      (2L, "http://big.example:80/b", s"$nav\n\nunique two\nshared half"),
      (3L, "http://big.example/c", s"$nav\nunique three"),
      (4L, "http://big.example/d", "unique four"),
      // small.example: 2 docs < minDocs=3 → its nav is exempt
      (5L, "http://small.example/a", s"$nav\nsmall body"),
      (6L, "http://small.example/b", s"$nav\nother body"),
      (7L, null: String, s"$nav\nno domain"), // null domain: untouched
      (8L, "http://big.example/e", null: String) // null text: null out
    ).toDF("doc_id", "url", "text")
    val out = Corpus.removeBoilerplate(docs, "doc_id", "url", "text",
        minFrac = 0.5, minDocs = 3)
      .select($"doc_id", $"text_clean", $"n_lines", $"n_removed")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // www./port spellings collapse into one domain: nav df=3/4
    assert(out(1L)._1.get === "unique one") // nav AND shared half (2/4 = 0.5 >= 0.5) dropped
    assert(out(2L)._1.get === "\nunique two") // empty line survives
    assert(out(3L)._1.get === "unique three")
    assert(out(4L)._1.get === "unique four")
    assert(out(1L)._3.get === 2) // nav + shared half
    // small domain keeps its 100%-frequency nav
    assert(out(5L)._1.get === s"$nav\nsmall body")
    assert(out(6L)._1.get === s"$nav\nother body")
    // null domain: nothing removed
    assert(out(7L)._1.get === s"$nav\nno domain")
    // null text: null output, null counters
    assert(out(8L) === ((None, None, None)))
  }

  test("c4Clean: line gate, page blocks, floor, null text (r15)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A perfectly fine sentence with words.\nshort.\nAnother good long sentence right here!"),
      (2L, "A perfectly fine sentence with words.\nnothing else survives here"),
      (3L, "Good first sentence with five words.\nGood second sentence with five words.\nvar x = { a: 1 }"),
      (4L, "Good first sentence with five words.\nGood second sentence with five words.\nLOREM IPSUM dolor."),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.operators.Corpus.c4Clean(docs, "doc_id", "text",
        minLineWords = 5, minLines = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)))))
      .toMap
    assert(got(1L) === ((true, 3L, 2L, Some(
      "A perfectly fine sentence with words.\nAnother good long sentence right here!"))))
    assert(got(2L) === ((false, 2L, 1L, None))) // floor
    assert(got(3L) === ((false, 3L, 2L, None))) // curly brace
    assert(got(4L) === ((false, 3L, 2L, None))) // lorem ipsum, case-folded
    assert(got(5L)._1 === false)                // null text: one empty line, kept=false
  }

  test("c4Clean blockWords: word-boundary bad-words gate, case/punct folded, superstrings survive (r17)") {
    import spark.implicits._
    val docs = Seq(
      // blocked word, capitalized + trailing comma: the page dies
      // even though the LINE passes its own rules
      (1L, "Good first sentence with five words.\nThis line mentions Shit, somewhere else today."),
      // superstrings of list words at word boundaries must NOT match
      (2L, "The dickens classic shitake story is long.\nAnother good long sentence right here!"),
      // same text, gate off: nothing blocked
      (3L, "This line mentions Shit, somewhere else today.\nAnother good long sentence right here!"),
      // ACCENTED superstrings (r18, the r17 advisor): a non-ASCII
      // letter must NOT act as a word boundary — "shité" is one
      // token, not "shit"+"é", so the page survives
      (4L, "The shité weather kept everyone happily indoors.\nAnother good long sentence right here!"))
      .toDF("doc_id", "text")
    def run(words: Seq[String]) =
      graft.operators.Corpus.c4Clean(docs, "doc_id", "text",
          minLineWords = 5, minLines = 2, blockWords = words)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val gated = run(graft.functions.Text.BadWordsEnglish)
    assert(gated(1L) === false) // word gate fires through case + punctuation
    assert(gated(2L) === true)  // dickens/shitake are not dick/shit
    assert(gated(4L) === true)  // shité is not shit: unicode boundaries
    val off = run(Nil)
    assert(off(1L) === true && off(3L) === true) // default: gate off
  }

  test("temperatureMix: alpha upsamples small strata, budget floors hold, re-runs byte-identical (r17)") {
    import spark.implicits._
    // 400 "big" docs vs 25 "small": proportional (alpha=1) at budget
    // 100 gives small ~5; sqrt weighting gives small 100·5/25 = 20
    val df = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1025L).map(i => (i, "small"))).toDF("id", "stratum")
    def kOf(alpha: Double) =
      graft.operators.Corpus.temperatureMix(df, "stratum", "id", 100L, alpha)
        .groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val prop = kOf(1.0)
    val sqr = kOf(0.5)
    assert(prop("big") === 94L && prop("small") === 5L) // floor(100*400/425), floor(100*25/425)
    assert(sqr("small") === 20L && sqr("big") === 80L)  // sqrt(400)=20, sqrt(25)=5
    assert(sqr.values.sum <= 100L && prop.values.sum <= 100L)
    // a stratum smaller than its target is capped at its size
    val capped = graft.operators.Corpus.temperatureMix(df, "stratum", "id", 2000L, 0.5)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("small") === 25L)
    // determinism: identical kept set across runs, for both families
    def ids(family: String) =
      graft.operators.Corpus.temperatureMix(df, "stratum", "id", 100L, 0.5,
        family = family).select("id").collect().map(_.getLong(0)).toSet
    assert(ids("xxh64") === ids("xxh64"))
    assert(ids("md5") === ids("md5"))
  }

  test("hostProfile: status classes, unparsed envelopes, non-responses excluded (r15)") {
    import spark.implicits._
    val rows = Seq[(String, String, Option[Int], Long)](
      ("response", "http://a.example/1", Some(200), 100L),
      ("response", "http://a.example/2", Some(301), 50L),
      ("response", "http://a.example/3", None, 20L),
      ("response", "http://b.example/1", Some(503), 10L),
      ("conversion", "http://a.example/wet", Some(200), 5L),
      ("response", "not-a-url", Some(200), 5L))
      .toDF("warc_type", "target_uri", "http_status", "content_length")
    val got = graft.operators.Corpus.hostProfile(rows)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got === Map(
      "a.example" -> ((3L, 1L, 1L, 0L, 1L, 170L)),
      "b.example" -> ((1L, 0L, 0L, 1L, 0L, 10L))))
  }
}
