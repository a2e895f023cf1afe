package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private val Long1 = "This is the first substantial paragraph of the article, " +
    "long enough to clear the seventy character floor easily."
  private val Long2 = "A second long paragraph follows with more real prose, " +
    "also comfortably past the length threshold for good blocks."

  private def run(html: String, minLen: Int = 70, maxLd: Double = 0.2) =
    Corpus.extractContent(Seq((1L, html)).toDF("id", "html"), "html",
        minTextChars = minLen, maxLinkDensity = maxLd)
      .select("content", "n_blocks", "n_kept")
      .collect().head

  test("chrome dies, article survives, heading rescued by its good neighbour") {
    val html =
      s"""<html><head><title>ignored title</title><style>.n{}</style></head>
         |<body>
         |<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>
         |<h1>Article headline</h1>
         |<p>$Long1</p>
         |<p>$Long2</p>
         |<ul><li><a href="/1">Related one</a></li><li><a href="/2">Related two</a></li></ul>
         |<div>copyright example site</div>
         |</body></html>""".stripMargin
    val r = run(html)
    assert(r.getString(0) ===
      s"Article headline\n$Long1\n$Long2")
    assert(r.getInt(1) === 7) // nav, h1, p, p, li, li, footer
    assert(r.getInt(2) === 3)
  }

  test("long but link-dense block dies on density; unclosed anchor contributes no link text") {
    val dense = "<p><a href=\"/r\">read the full report right here and now today" +
      " please do</a> with a few plain words added on the side to pass length</p>"
    val r1 = run(s"<body><p>$Long1</p>$dense</body>")
    assert(r1.getString(0) === Long1) // dense block dropped despite length
    // same block with the anchor left UNCLOSED: link text = 0, block is good
    val open = dense.replace("</a>", "")
    val r2 = run(s"<body><p>$Long1</p>$open</body>")
    assert(r2.getInt(2) === 2)
  }

  test("a short block with no good neighbour dies; between goods it lives") {
    // isolated short blocks: nothing is ever good -> everything dies
    val r1 = run("<body><p>short one</p><p>short two</p></body>")
    assert(r1.getString(0) === "")
    assert(r1.getInt(1) === 2 && r1.getInt(2) === 0)
    // rescued only when adjacent to a good block (one hop, not two)
    val r2 = run(s"<body><p>lead-in</p><p>$Long1</p><p>tail note</p>" +
      "<p>too far away</p></body>")
    assert(r2.getString(0) === s"lead-in\n$Long1\ntail note")
  }

  test("script/style/head/comment bodies never become blocks; entities and inline tags resolve") {
    val html = "<head><script>var x = '<p>fake</p>';</script></head>" +
      "<body><!-- <p>comment para</p> -->" +
      s"<p>Caf&eacute; <b>bold</b> &amp; plain $Long1</p></body>"
    val r = run(html)
    assert(r.getString(0) === s"Café bold & plain $Long1")
    assert(r.getInt(1) === 1)
  }

  test("stopword floor: keyword spam dies despite length, headings stay rescuable, default off (r16)") {
    val spam = "buy cheap widgets gadgets doohickeys trinkets gizmos " +
      "contraptions implements apparatus equipment hardware units"
    val html = s"<body><h2>Section heading</h2><p>$Long1</p><p>$spam</p></body>"
    def run(sf: Double) =
      Corpus.extractContent(Seq((1L, html)).toDF("id", "html"), "html",
          minStopwordFrac = sf)
        .select("content").collect().head.getString(0)
    // arm off: the spam block is long and link-free -> kept
    assert(run(0.0) === s"Section heading\n$Long1\n$spam")
    // arm on: spam has zero stopwords -> dies on the floor, and it
    // must NOT ride back in on its good neighbour (long blocks are
    // never rescued); the stopword-free HEADING still rescues
    assert(run(0.1) === s"Section heading\n$Long1")
  }

  test("extractContentByLang (r17): each row's language picks its list; unknown language disables the floor") {
    val spam = "buy cheap widgets gadgets doohickeys trinkets gizmos " +
      "contraptions implements apparatus equipment hardware"
    val deProse = "der hund und die katze sind in dem haus mit einem " +
      "ball und es war nicht weit von dem garten"
    val ruProse = "и собака и кошка были в доме с мячом и это было не " +
      "далеко от сада но они были там"
    def page(body: String) =
      s"<body><h2>Kopf</h2><p>$body</p><p>$spam</p></body>"
    val df = Seq(
      (1L, "de", page(deProse)),
      (2L, "ru", page(ruProse)),
      (3L, "zz", page(deProse)), // no list -> floor off
      (4L, "de", page(ruProse))) // wrong-language prose dies like spam
      .toDF("id", "lang", "html")
    val got = Corpus.extractContentByLang(df, "html", "lang",
        minStopwordFrac = 0.25)
      .orderBy("id").select("content", "n_kept").collect()
    // de prose clears its own floor; spam has 0 stopwords under any
    // list and is long (never rescued); the short heading rides the
    // good body
    assert(got(0).getString(0) === s"Kopf\n$deProse")
    assert(got(0).getInt(1) === 2)
    // ru prose clears the RUSSIAN list (under the English/German list
    // it would score 0 — row 4 proves that)
    assert(got(1).getString(0) === s"Kopf\n$ruProse")
    // unknown language: floor disabled, spam survives on length alone
    assert(got(2).getString(0) === s"Kopf\n$deProse\n$spam")
    assert(got(2).getInt(1) === 3)
    // russian prose under the German list: no function words counted,
    // body dies, heading loses its neighbour and dies too
    assert(got(3).getString(0) === "")
    assert(got(3).getInt(1) === 0)
  }

  test("floorByLang (r18): a per-language floor override reaches the gate; other rows keep the scalar") {
    // Kazakh prose at exactly 4/18 = 0.222 list hits — under the
    // 0.25 global floor (agglutination attaches the function
    // morphemes), over a 0.15 kk override; the en row must still be
    // judged by the scalar (its spam-like body has 0 stopwords)
    val kkProse = "үй бақшада тұрады және ит ауланы күзетеді бірақ " +
      "өзен алыс емес балалар таңертең мектепке барады олар кешке қайтады"
    val spam = "buy cheap widgets gadgets doohickeys trinkets gizmos " +
      "contraptions implements apparatus equipment hardware"
    def page(body: String) = s"<body><h2>Kopf</h2><p>$body</p></body>"
    val df = Seq(
      (1L, "kk", page(kkProse)),
      (2L, "en", page(spam)))
      .toDF("id", "lang", "html")
    def run(floors: Map[String, Double]) =
      Corpus.extractContentByLang(df, "html", "lang",
          minStopwordFrac = 0.25, floorByLang = floors)
        .orderBy("id").select("content").collect().map(_.getString(0))
    // without the override the kk body dies on the scalar floor
    assert(run(Map.empty) === Array("", ""))
    val got = run(Map("kk" -> 0.15))
    assert(got(0) === s"Kopf\n$kkProse") // override keeps real prose
    assert(got(1) === "")                // en row still on the scalar
  }

  test("crawlTextOf(mainContent = true): chrome-free text off a raw crawl frame; default keeps WET parity") {
    def rec(uri: String, body: String) =
      ("response", uri, 200, "text/html; charset=utf-8",
        null: String, null: String, body.getBytes("UTF-8"))
    val crawl = Seq(
      rec("http://h.example/article",
        "<html><body><div><a href=\"/\">Home</a> <a href=\"/a\">About</a>" +
          s"</div><p>$Long1</p><ul><li><a href=\"/x\">More</a></li></ul>" +
          "<div>copyright chrome</div></body></html>"))
      .toDF("warc_type", "target_uri", "http_status", "http_content_type",
        "http_content_encoding", "http_transfer_encoding", "body")
    val main = graft.sources.WarcSource.crawlTextOf(crawl, mainContent = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(main("http://h.example/article") === Long1)
    // the default chain keeps WET parity: chrome text stays
    val wet = graft.sources.WarcSource.crawlTextOf(crawl)
      .collect().head.getString(1)
    assert(wet === s"Home About $Long1 More copyright chrome")
  }

  test("null html yields null outputs; empty page yields empty content; columns carry") {
    val df = Seq((1L, null: String, "k1"), (2L, "<body></body>", "k2"))
      .toDF("id", "html", "tag")
    val got = Corpus.extractContent(df, "html").orderBy("id")
      .select("id", "tag", "content", "n_blocks", "n_kept").collect()
    assert(got(0).isNullAt(2) && got(0).isNullAt(3) && got(0).isNullAt(4))
    assert(got(0).getString(1) === "k1") // carried
    assert(got(1).getString(2) === "" && got(1).getInt(3) === 0 &&
      got(1).getInt(4) === 0)
  }
}
