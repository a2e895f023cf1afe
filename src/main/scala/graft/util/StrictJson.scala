package graft.util

/** Minimal strict JSON reader for graft's OWN machine artifacts —
  * the nested-value sibling of [[IndexMarker]]'s flat marker parser
  * (r17, closing the r16 verdict's "wrong #3"): `Bench.parseStats`
  * regex-scanned its child JVMs' JSON by FIXED KEY ORDER, exactly
  * the first-match-reader failure class the r15 marker refactor
  * eliminated for persisted indexes. This parser is order-blind and
  * refuses loudly instead of permissively:
  *
  *  - full JSON value grammar (objects, arrays, strings with the
  *    standard escapes, numbers, booleans, null) — our artifacts
  *    nest (`"spread":{"q01":{"med":…}}`), so the flat marker parser
  *    cannot be reused directly;
  *  - DUPLICATE KEYS in an object refuse (no writer of ours emits
  *    them; a duplicate means the file is corrupt or foreign);
  *  - trailing content after the root value refuses;
  *  - anything malformed throws `IllegalArgumentException` naming
  *    the offset — callers turn that into a loud retry/fallback,
  *    never a silently-wrong number.
  *
  * NOT a general-purpose JSON library (no streaming, no unicode
  * validation beyond the JVM's, materializes everything): bench
  * artifacts are a few KB, read once per child. */
private[graft] object StrictJson {

  sealed trait Value
  final case class JObj(fields: Vector[(String, Value)]) extends Value {
    def get(k: String): Option[Value] = fields.find(_._1 == k).map(_._2)
    def obj(k: String): Option[JObj] = get(k).collect { case o: JObj => o }
    def arr(k: String): Option[JArr] = get(k).collect { case a: JArr => a }
    def num(k: String): Option[Double] = get(k).collect { case JNum(d) => d }
    def str(k: String): Option[String] = get(k).collect { case JStr(s) => s }
  }
  final case class JArr(items: Vector[Value]) extends Value
  final case class JStr(s: String) extends Value
  final case class JNum(d: Double) extends Value
  final case class JBool(b: Boolean) extends Value
  case object JNull extends Value

  def parse(txt: String): Value = {
    val s = txt
    val n = s.length
    var i = 0
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"malformed JSON ($why at offset $i)")
    def skipWs(): Unit =
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def string(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      var done = false
      while (!done) {
        if (i >= n) fail("unterminated string")
        s.charAt(i) match {
          case '"' => i += 1; done = true
          case '\\' =>
            i += 1
            if (i >= n) fail("unterminated escape")
            s.charAt(i) match {
              case '"' => sb.append('"'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case '/' => sb.append('/'); i += 1
              case 'n' => sb.append('\n'); i += 1
              case 't' => sb.append('\t'); i += 1
              case 'r' => sb.append('\r'); i += 1
              case 'b' => sb.append('\b'); i += 1
              case 'f' => sb.append('\f'); i += 1
              case 'u' =>
                if (i + 4 >= n) fail("truncated \\u escape")
                val hex = s.substring(i + 1, i + 5)
                // Integer.parseInt accepts a leading sign, so '\u+12f'
                // would parse silently — require 4 literal hex digits
                // (r18, the r17 advisor's refuse-loudly gap)
                if (!hex.forall(c => Character.digit(c, 16) >= 0))
                  fail(s"bad \\u escape '$hex'")
                sb.append(Integer.parseInt(hex, 16).toChar)
                i += 5
              case c => fail(s"unknown escape '\\$c'")
            }
          case c if c < ' ' => fail("raw control character in string")
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    def number(): JNum = {
      val start = i
      if (i < n && s.charAt(i) == '-') i += 1
      while (i < n && (Character.isDigit(s.charAt(i)) || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) fail("expected a number")
      try JNum(java.lang.Double.parseDouble(s.substring(start, i)))
      catch { case _: NumberFormatException => fail(s"bad number '${s.substring(start, i)}'") }
    }
    def value(): Value = {
      skipWs()
      if (i >= n) fail("truncated")
      s.charAt(i) match {
        case '{' =>
          i += 1
          skipWs()
          if (i < n && s.charAt(i) == '}') { i += 1; JObj(Vector.empty) }
          else {
            var fields = Vector.empty[(String, Value)]
            var more = true
            while (more) {
              skipWs()
              val k = string()
              if (fields.exists(_._1 == k)) fail(s"duplicate key '$k'")
              expect(':')
              fields :+= (k -> value())
              skipWs()
              if (i < n && s.charAt(i) == ',') { i += 1; more = true }
              else more = false
            }
            expect('}')
            JObj(fields)
          }
        case '[' =>
          i += 1
          skipWs()
          if (i < n && s.charAt(i) == ']') { i += 1; JArr(Vector.empty) }
          else {
            var items = Vector.empty[Value]
            var more = true
            while (more) {
              items :+= value()
              skipWs()
              if (i < n && s.charAt(i) == ',') { i += 1; more = true }
              else more = false
            }
            expect(']')
            JArr(items)
          }
        case '"' => JStr(string())
        case 't' =>
          if (s.startsWith("true", i)) { i += 4; JBool(true) } else fail("bad literal")
        case 'f' =>
          if (s.startsWith("false", i)) { i += 5; JBool(false) } else fail("bad literal")
        case 'n' =>
          if (s.startsWith("null", i)) { i += 4; JNull } else fail("bad literal")
        case _ => number()
      }
    }
    val root = value()
    skipWs()
    if (i != n) fail("trailing content after the root value")
    root
  }
}
