package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text

/** The multilingual stopword tables (r18, closing the r17 verdict's
  * coverage ask: 22 → 51 of LangId's 55 languages). These lists are
  * data, so the spec validates them EMPIRICALLY against the langid
  * fixture corpus (40 real prose sentences per language, the same
  * file the trainable LangId gates on): a list whose words don't
  * actually occur in its language's prose would silently turn the
  * stopword floor into a reject-everything gate for that language.
  * Measured aggregate hit-rates (r18): analytic languages 0.2–0.35,
  * agglutinative / case-suffixing ones 0.09–0.15 (fi lowest at
  * 0.09 — Finnish function morphemes attach to content words). The
  * floors asserted here sit under those with slack; raising a
  * language's floor means re-measuring, not wishing. */
class TextStopwordsSpec extends AnyFunSuite {

  private lazy val fixture: Map[String, Seq[String]] = {
    val in = getClass.getResourceAsStream("/langid_fixtures.tsv")
    assert(in != null, "langid_fixtures.tsv missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toSeq
      .map { l => val Array(lang, text) = l.split("\t", 2); lang -> text }
      .groupMap(_._1)(_._2)
    finally src.close()
  }

  // mirrors the extractContent probe regime: blocks are
  // space-collapsed, tokens are space-split and lowercased; edge
  // punctuation stripped here because fixture sentences carry none
  // mid-word and the probe's real inputs are punctuation-attached
  // (a conservative under-count, so floors measured this way hold)
  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").toSeq
      .map(_.stripPrefix("«").dropWhile(".,!?;:\"()[]".contains(_))
        .reverse.dropWhile(".,!?;:\"()[]".contains(_)).reverse)
      .filter(_.nonEmpty)

  private def aggFrac(lang: String): Double = {
    val ws = Text.StopwordLists(lang).toSet
    val all = fixture(lang).flatMap(toks)
    all.count(ws) .toDouble / all.size
  }

  test("hygiene: every list is lowercase, duplicate-free, substantive") {
    for ((lang, ws) <- Text.StopwordLists) {
      assert(ws.size >= 12, s"$lang: only ${ws.size} words")
      assert(ws.distinct.size === ws.size, s"$lang: duplicate entries")
      for (w <- ws) {
        assert(w.nonEmpty && !w.exists(_.isWhitespace), s"$lang: bad entry '$w'")
        assert(w == w.toLowerCase(java.util.Locale.ROOT), s"$lang: not lowercase '$w'")
      }
    }
  }

  test("coverage: 51 of LangId's 55 languages; the 4 exclusions are structural") {
    val fixtureLangs = fixture.keySet
    assert(fixtureLangs.size === 55)
    assert(Text.StopwordLists.keySet.subsetOf(fixtureLangs))
    assert(Text.StopwordLists.size >= 51)
    // zh/ja/th write without word spaces; ko eojeol bundle particles
    // onto content words — a token-fraction floor is meaningless or
    // false-rejecting there, and an absent language DISABLES the
    // floor (extractContentByLang), which never false-rejects
    for (l <- Seq("zh", "ja", "th", "ko"))
      assert(!Text.StopwordLists.contains(l), s"$l must stay excluded")
  }

  test("every list actually fires on its language's real prose (agg fraction >= 0.08)") {
    val weak = Text.StopwordLists.keys.toSeq.sorted
      .map(l => l -> aggFrac(l)).filter(_._2 < 0.08)
    assert(weak.isEmpty, s"lists too weak for their own prose: $weak")
  }

  test("analytic-language lists clear the serving floor with room (>= 35 languages at 0.15)") {
    val strong = Text.StopwordLists.keys.count(l => aggFrac(l) >= 0.15)
    assert(strong >= 35, s"only $strong languages reach 0.15 aggregate")
  }

  test("keyword spam scores zero under every list") {
    val spam = toks("buy cheap widgets gadgets doohickeys trinkets " +
      "gizmos contraptions implements apparatus equipment hardware")
    for ((lang, ws) <- Text.StopwordLists if lang != "en") {
      val hits = spam.count(ws.toSet)
      assert(hits === 0, s"$lang matches English spam tokens")
    }
  }
}
