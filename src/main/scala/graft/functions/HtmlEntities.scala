package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding for the crawl-to-text path
  * (r14, closing the r13 verdict's "missing #2"): the r13
  * `stripHtml` decoded six named entities via chained replaces, so
  * on real non-English pages numeric character references
  * (`&#233;`, `&#x2014;`) and the common extended names (`&eacute;`,
  * `&mdash;`, `&rsquo;`) passed through as LITERAL text — entity
  * junk feeding langid grams, shingles and quality signals
  * downstream. One left-to-right pass decodes:
  *
  *  - `&#NNN;` / `&#xHH;` numeric references to the full Unicode
  *    range (supplementary planes via surrogate pairs); invalid
  *    code points (0, > U+10FFFF, surrogates) and malformed digits
  *    stay literal — loud in the visible text, never a replacement
  *    char the quality gates can't see;
  *  - the HTML4 named-entity repertoire: the five XML predefineds,
  *    the full Latin-1 block (`&eacute;`-class — the entities that
  *    carry accented European text), Greek letters, and the general
  *    punctuation/symbol set (`&mdash;`, `&rsquo;`, `&hellip;`,
  *    `&euro;`, arrows, math comparisons);
  *  - anything unrecognized (including a bare `&`) passes through
  *    unchanged.
  *
  * Single-pass semantics are the standard contract: `&amp;lt;`
  * yields the literal `&lt;` because scanning continues AFTER the
  * decoded output, never over it — the behavior the r13 fold only
  * approximated by ordering `&amp;` last. Semicolons are required
  * (the HTML5 no-semicolon legacy list is a browser-compat quirk;
  * requiring `;` keeps the transform deterministic and
  * oracle-expressible). The entity name cap (32 chars to the
  * semicolon) bounds the scan — a stray `&` in prose never triggers
  * a long lookahead.
  *
  * Static-call codegen (the `Int32LeRuntime` discipline); the fast
  * path for entity-free text (the overwhelming majority of rows
  * after tag stripping) is one `indexOf('&')`. */
object HtmlEntitiesRuntime {

  /** HTML4 Latin-1 entity names in code-point order (U+00A0..U+00FF). */
  private val Latin1Names = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  /** Greek-letter entity names (HTML4 symbol set): uppercase
    * U+0391..U+03A9 (no final sigma slot), lowercase U+03B1..U+03C9
    * plus `sigmaf` for U+03C2. */
  private val GreekUpper = Array(
    "Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Eta", "Theta",
    "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron", "Pi",
    "Rho", null /* U+03A2 unassigned */, "Sigma", "Tau", "Upsilon", "Phi",
    "Chi", "Psi", "Omega")
  private val GreekLower = Array(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
    "rho", "sigmaf", "sigma", "tau", "upsilon", "phi",
    "chi", "psi", "omega")

  /** General punctuation / symbols (HTML4 special + symbol sets,
    * the names real pages actually carry). */
  private val Symbols: Seq[(String, Int)] = Seq(
    "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
    "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6, "tilde" -> 0x2DC,
    "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009,
    "zwnj" -> 0x200C, "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
    "ndash" -> 0x2013, "mdash" -> 0x2014,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
    "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E,
    "dagger" -> 0x2020, "Dagger" -> 0x2021, "bull" -> 0x2022,
    "hellip" -> 0x2026, "permil" -> 0x2030, "prime" -> 0x2032,
    "Prime" -> 0x2033, "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
    "oline" -> 0x203E, "frasl" -> 0x2044, "euro" -> 0x20AC,
    "trade" -> 0x2122, "alefsym" -> 0x2135,
    "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192,
    "darr" -> 0x2193, "harr" -> 0x2194,
    "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221A,
    "prop" -> 0x221D, "infin" -> 0x221E,
    "cap" -> 0x2229, "cup" -> 0x222A, "int" -> 0x222B,
    "asymp" -> 0x2248, "ne" -> 0x2260, "equiv" -> 0x2261,
    "le" -> 0x2264, "ge" -> 0x2265,
    "loz" -> 0x25CA, "spades" -> 0x2660, "clubs" -> 0x2663,
    "hearts" -> 0x2665, "diams" -> 0x2666)

  private[functions] val Entities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    m.put("amp", "&"); m.put("lt", "<"); m.put("gt", ">")
    m.put("quot", "\""); m.put("apos", "'")
    var i = 0
    while (i < Latin1Names.length) {
      m.put(Latin1Names(i), String.valueOf((0xA0 + i).toChar)); i += 1
    }
    i = 0
    while (i < GreekUpper.length) {
      if (GreekUpper(i) != null)
        m.put(GreekUpper(i), String.valueOf((0x391 + i).toChar))
      i += 1
    }
    i = 0
    while (i < GreekLower.length) {
      m.put(GreekLower(i), String.valueOf((0x3B1 + i).toChar)); i += 1
    }
    Symbols.foreach { case (n, cp) => m.put(n, new String(Character.toChars(cp))) }
    m
  }

  /** Decoded replacement for the entity BODY (between `&` and `;`),
    * or null when it is not a recognized reference. */
  private def decodeBody(body: String): String = {
    if (body.isEmpty) return null
    if (body.charAt(0) == '#') {
      if (body.length < 2) return null
      var cp = 0L
      if (body.charAt(1) == 'x' || body.charAt(1) == 'X') {
        if (body.length < 3) return null
        var i = 2
        while (i < body.length) {
          val d = Character.digit(body.charAt(i), 16)
          if (d < 0) return null
          cp = cp * 16 + d
          if (cp > 0x10FFFFL) return null
          i += 1
        }
      } else {
        var i = 1
        while (i < body.length) {
          val d = Character.digit(body.charAt(i), 10)
          if (d < 0) return null
          cp = cp * 10 + d
          if (cp > 0x10FFFFL) return null
          i += 1
        }
      }
      if (cp <= 0L || (cp >= 0xD800L && cp <= 0xDFFFL)) null
      else new String(Character.toChars(cp.toInt))
    } else Entities.get(body)
  }

  private val Amp = UTF8String.fromString("&")

  def decode(s: UTF8String): UTF8String = {
    if (s == null) return null
    // Entity-free fast path on the raw bytes: '&' is 0x26 in UTF-8 and
    // never a continuation byte, so a byte search is exact — the common
    // no-entity row returns without materializing a String copy.
    if (!s.contains(Amp)) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        // Bounded lookahead: an entity body is at most 32 chars to the
        // semicolon, so scan at most that window for ';'. An unbounded
        // indexOf here made ampersand-flooded semicolon-free pages
        // (bodies reach the 64 MiB post-inflate cap) O(n^2).
        var semi = -1
        var j = i + 1
        val stop = math.min(n, i + 34)
        while (semi < 0 && j < stop) {
          if (str.charAt(j) == ';') semi = j
          j += 1
        }
        val decoded =
          if (semi < 0 || semi - i > 32) null
          else decodeBody(str.substring(i + 1, semi))
        if (decoded == null) { sb.append(c); i += 1 }
        else { sb.append(decoded); i = semi + 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `html_entity_decode(text)` — see [[HtmlEntitiesRuntime.decode]]. */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_entity_decode expects string, got $t")
  }
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "html_entity_decode"
  override protected def nullSafeEval(s: Any): Any =
    HtmlEntitiesRuntime.decode(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"${ev.value} = graft.functions.HtmlEntitiesRuntime.decode($d);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntities {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Decode HTML character references (numeric + the HTML4 named
    * repertoire) in one left-to-right pass. */
  def decodeEntities(c: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(ColumnBridge.expression(c)))
}
