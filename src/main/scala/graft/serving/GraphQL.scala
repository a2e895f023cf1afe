package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession

/** GraphQL query surface over the registered tables/views — the
  * reference's E3 Postgraphile layer (`docker-compose.yaml:46-72`:
  * Postgres views auto-exposed as GraphQL) re-expressed over Spark.
  *
  * Postgraphile generates, per view, a root field taking `condition`
  * (field equality), `first`/`offset` (pagination) and an order; this
  * implements exactly that shape over the session catalog:
  *
  * {{{
  * { Transfer_address_from_address_to_uint256_amount_d(
  *     condition: {contract_address: "0x…"}, first: 10,
  *     orderBy: "evt_block_number", desc: true)
  *   { from to amount evt_block_number } }
  * }}}
  *
  * Compilation target is ONE Spark SQL statement per root field —
  * selection list → projection (column pruning), condition → WHERE
  * (predicate pushdown into the parquet scan, since the views are
  * expression projections Catalyst inlines), first/offset → LIMIT.
  * The GraphQL layer adds no execution machinery of its own, exactly
  * like Postgraphile compiling to SQL for Postgres.
  *
  * Hand-rolled recursive-descent parser for the subset (no GraphQL
  * library in the dependency budget); identifiers are validated
  * against the actual view schema and values are rendered as escaped
  * SQL literals, so neither field names nor values can smuggle SQL.
  */
object GraphQL {

  case class FieldQuery(
      view: String,
      condition: Seq[(String, Any)],
      first: Option[Long],
      offset: Option[Long],
      orderBy: Option[String],
      desc: Boolean,
      selections: Seq[String])

  case class ParseError(msg: String) extends RuntimeException(msg)

  // ---- tokenizer -----------------------------------------------------

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Num(s: String) extends Tok
  private case class Punct(c: Char) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace || c == ',') i += 1
      else if (c == '#') { while (i < q.length && q(i) != '\n') i += 1 } // comment
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Ident(q.substring(start, i))
      } else if (c.isDigit || (c == '-' && i + 1 < q.length && q(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < q.length && (q(i).isDigit || q(i) == '.')) i += 1
        out += Num(q.substring(start, i))
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < q.length && q(i) != '"') {
          if (q(i) == '\\') {
            if (i + 1 >= q.length) throw ParseError("unterminated escape")
            // the GraphQL spec escape set; anything else is an error, not
            // a silent pass-through (a verbatim copy would turn \n into
            // the letter n and match the wrong literal against the data)
            q(i + 1) match {
              case '"' => sb.append('"'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '/' => sb.append('/'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'u' =>
                if (i + 6 > q.length) throw ParseError("truncated \\u escape")
                val hex = q.substring(i + 2, i + 6)
                val cp =
                  try Integer.parseInt(hex, 16)
                  catch { case _: NumberFormatException =>
                    throw ParseError(s"invalid \\u escape '\\u$hex'") }
                sb.append(cp.toChar); i += 6
              case other => throw ParseError(s"unknown escape '\\$other'")
            }
          } else { sb.append(q(i)); i += 1 }
        }
        if (i >= q.length) throw ParseError("unterminated string")
        i += 1
        out += Str(sb.toString)
      } else if ("{}():".contains(c)) { out += Punct(c); i += 1 }
      else throw ParseError(s"unexpected character '$c'")
    }
    out.toList
  }

  // ---- parser --------------------------------------------------------

  private class Parser(var toks: List[Tok]) {
    def expect(c: Char): Unit = toks match {
      case Punct(`c`) :: rest => toks = rest
      case t => throw ParseError(s"expected '$c', got $t")
    }
    def ident(): String = toks match {
      case Ident(s) :: rest => toks = rest; s
      case t => throw ParseError(s"expected identifier, got $t")
    }
    def peekIs(c: Char): Boolean = toks.headOption.contains(Punct(c))

    def value(): Any = toks match {
      case Str(s) :: rest => toks = rest; s
      case Num(s) :: rest =>
        toks = rest
        if (s.contains('.')) s.toDouble else s.toLong
      case Ident("true") :: rest => toks = rest; true
      case Ident("false") :: rest => toks = rest; false
      case Ident("null") :: rest => toks = rest; null
      case t => throw ParseError(s"expected value, got $t")
    }

    def objectArg(): Seq[(String, Any)] = {
      expect('{')
      val pairs = scala.collection.mutable.ListBuffer[(String, Any)]()
      while (!peekIs('}')) {
        val k = ident(); expect(':'); pairs += k -> value()
      }
      expect('}')
      pairs.toSeq
    }

    def field(): FieldQuery = {
      val view = ident()
      var condition = Seq.empty[(String, Any)]
      var first, offset = Option.empty[Long]
      var orderBy = Option.empty[String]
      var desc = false
      if (peekIs('(')) {
        expect('(')
        while (!peekIs(')')) {
          val arg = ident(); expect(':')
          arg match {
            case "condition" => condition = objectArg()
            case "first" => first = Some(value() match {
              case l: Long => l; case o => throw ParseError(s"first: expected int, got $o") })
            case "offset" => offset = Some(value() match {
              case l: Long => l; case o => throw ParseError(s"offset: expected int, got $o") })
            case "orderBy" => orderBy = Some(value() match {
              case s: String => s; case o => throw ParseError(s"orderBy: expected string, got $o") })
            case "desc" => desc = value() match {
              case b: Boolean => b; case o => throw ParseError(s"desc: expected boolean, got $o") }
            case other => throw ParseError(s"unknown argument '$other'")
          }
        }
        expect(')')
      }
      expect('{')
      val sels = scala.collection.mutable.ListBuffer[String]()
      while (!peekIs('}')) sels += ident()
      expect('}')
      if (sels.isEmpty) throw ParseError(s"$view: empty selection set")
      FieldQuery(view, condition, first, offset, orderBy, desc, sels.toSeq)
    }

    def query(): Seq[FieldQuery] = {
      // optional `query` / `subscription` (+ optional name) header —
      // subscriptions share the grammar; [[Subscriptions]] enforces
      // the single-root-field rule
      toks match {
        case Ident("query" | "subscription") :: rest =>
          toks = rest
          toks match { case Ident(_) :: r2 => toks = r2; case _ => () }
        case _ => ()
      }
      expect('{')
      val fields = scala.collection.mutable.ListBuffer[FieldQuery]()
      while (!peekIs('}')) fields += field()
      expect('}')
      if (toks.nonEmpty) throw ParseError(s"trailing input: ${toks.head}")
      if (fields.isEmpty) throw ParseError("empty query")
      fields.toSeq
    }
  }

  def parse(q: String): Seq[FieldQuery] = new Parser(tokenize(q)).query()

  // ---- compilation ---------------------------------------------------

  private def sqlLiteral(v: Any): String = v match {
    case null => "null"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case l: Long => l.toString
    case d: Double => d.toString
    case b: Boolean => b.toString
    case other => throw ParseError(s"unsupported literal $other")
  }

  /** Page-size policy: a query that omits `first` gets `defaultFirst`
    * rows, and no query can ask for more than `maxFirst` — the serving
    * driver must never `collect()` an unbounded result (one curl
    * without `first` against a 100 TB view would otherwise OOM it;
    * Postgraphile survives the same query by cursor-streaming from
    * Postgres, an executor we don't have under `collect`). */
  val DefaultPageSize = 100L
  val MaxPageSize = 10000L

  private def whereClause(f: FieldQuery, checkCol: String => String): String =
    if (f.condition.isEmpty) ""
    else " where " + f.condition.map { case (k, v) =>
      if (v == null) s"${checkCol(k)} is null" else s"${checkCol(k)} = ${sqlLiteral(v)}"
    }.mkString(" and ")

  private def colChecker(spark: SparkSession, f: FieldQuery): String => String = {
    val schema =
      try spark.table(f.view).schema
      catch { case _: Exception => throw ParseError(s"unknown table or view '${f.view}'") }
    val cols = schema.fieldNames.toSet
    (c: String) =>
      if (cols(c)) s"`$c`"
      else throw ParseError(s"'${f.view}' has no field '$c' (has: ${schema.fieldNames.mkString(", ")})")
  }

  /** Compile one root field to a single Spark SQL statement. Every
    * identifier is checked against the view's actual schema — unknown
    * views and fields fail here, and names never reach the SQL text
    * unvalidated. The LIMIT is always present: `first` defaults to
    * `defaultFirst` and is clamped to `maxFirst` (negative is an
    * error), so the compiled statement is bounded by construction. */
  def compile(spark: SparkSession, f: FieldQuery,
              defaultFirst: Long = DefaultPageSize,
              maxFirst: Long = MaxPageSize): String = {
    val checkCol = colChecker(spark, f)
    val select = f.selections.map(checkCol).mkString(", ")
    val order = f.orderBy.map(c => s" order by ${checkCol(c)}" + (if (f.desc) " desc" else "")).getOrElse("")
    f.first.foreach(n => if (n < 0) throw ParseError(s"first: must be non-negative, got $n"))
    f.offset.foreach(n => if (n < 0) throw ParseError(s"offset: must be non-negative, got $n"))
    val effectiveFirst = math.min(f.first.getOrElse(defaultFirst), maxFirst)
    val offset = f.offset.map(n => s" offset $n").getOrElse("")
    s"select $select from `${f.view}`${whereClause(f, checkCol)}$order limit $effectiveFirst$offset"
  }

  /** The `totalCount` twin of [[compile]]: same view, same WHERE, no
    * page window — Postgraphile's connection semantics, where
    * `totalCount` is the number of rows matching the condition, not
    * the page length. */
  def compileCount(spark: SparkSession, f: FieldQuery): String = {
    val checkCol = colChecker(spark, f)
    s"select count(*) from `${f.view}`${whereClause(f, checkCol)}"
  }

  // ---- execution -----------------------------------------------------

  private val mapper = new ObjectMapper()

  /** Row-value → JSON field, shared with [[Subscriptions]]' renderer. */
  private[serving] def putValueOn(node: ObjectNode, name: String, v: Any): Unit =
    putValue(node, name, v)

  private def putValue(node: ObjectNode, name: String, v: Any): Unit = v match {
    case null => node.putNull(name)
    case s: String => node.put(name, s)
    case l: Long => node.put(name, l)
    case i: Int => node.put(name, i)
    case d: Double => node.put(name, d)
    case f: Float => node.put(name, f.toDouble)
    case b: Boolean => node.put(name, b)
    case d: java.math.BigDecimal => node.put(name, d)
    case d: scala.math.BigDecimal => node.put(name, d.bigDecimal)
    case other => node.put(name, other.toString) // timestamp/date/binary render as text
  }

  /** Execute a GraphQL document against the session catalog; returns
    * the response JSON (`{"data": …}` or `{"errors": [{"message": …}]}`
    * — the GraphQL wire contract). Each root field yields
    * `{"nodes": [...], "totalCount": N}`, Postgraphile's connection
    * shape: `nodes` is the (always-bounded) page, `totalCount` is the
    * full match count from a separate count(*) with the same WHERE —
    * an aggregate, so it collects one row no matter the view size. */
  def execute(spark: SparkSession, query: String,
              defaultFirst: Long = DefaultPageSize,
              maxFirst: Long = MaxPageSize): String = {
    val root = mapper.createObjectNode()
    try {
      val fields = parse(query)
      val data = root.putObject("data")
      fields.foreach { f =>
        val df = spark.sql(compile(spark, f, defaultFirst, maxFirst))
        val rows = df.collect()
        val total = spark.sql(compileCount(spark, f)).head().getLong(0)
        val conn = data.putObject(f.view)
        val nodes: ArrayNode = conn.putArray("nodes")
        rows.foreach { r =>
          val o = nodes.addObject()
          f.selections.zipWithIndex.foreach { case (name, i) =>
            putValue(o, name, r.get(i))
          }
        }
        conn.put("totalCount", total)
      }
    } catch {
      case e: ParseError =>
        root.removeAll()
        root.putArray("errors").addObject().put("message", e.msg)
      case e: Exception =>
        root.removeAll()
        root.putArray("errors").addObject().put("message", e.toString)
    }
    mapper.writeValueAsString(root)
  }

  // ---- HTTP endpoint -------------------------------------------------

  /** Extract the GraphQL document from a POST body, dispatching on
    * Content-Type per the GraphQL-over-HTTP convention:
    * `application/json` → `{"query": "..."}` envelope,
    * `application/graphql` → raw document. With no (or another)
    * Content-Type, try the JSON envelope first and fall back to raw
    * text — prefix-sniffing would misread pretty-printed JSON (a
    * newline after `{`) as a raw document. */
  private[graft] def extractQuery(contentType: Option[String], body: String): String = {
    val ct = contentType.getOrElse("").toLowerCase
    def fromJson: Option[String] =
      try {
        val node = mapper.readTree(body)
        if (node != null && node.isObject && node.has("query")) Some(node.get("query").asText)
        else None
      } catch { case _: Exception => None }
    if (ct.contains("application/json")) fromJson.getOrElse("")
    else if (ct.contains("application/graphql")) body
    else fromJson.getOrElse(body)
  }

  /** Serve `POST /graphql` (body = raw query text, or JSON
    * `{"query": "..."}` — the standard GraphQL HTTP convention) from
    * the given session. Returns the bound port. */
  def serve(spark: SparkSession, port: Int): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/graphql", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val query = extractQuery(
        Option(ex.getRequestHeaders.getFirst("Content-Type")), body)
      val resp = execute(spark, query)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    server
  }
}
