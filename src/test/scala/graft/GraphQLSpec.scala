package graft

import graft.serving.GraphQL
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

/** The E3 GraphQL surface: Postgraphile-style queries compiled to
  * single Spark SQL statements over the registered views. */
class GraphQLSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def registerFixture(): Unit = {
    val logs = Seq(
      ("0xaaa", 10L, 3L, "t1", false),
      ("0xaaa", 11L, 1L, "t2", false),
      ("0xbbb", 12L, 7L, "t3", false),
      ("0xbbb", 13L, 2L, "t4", true))
      .toDF("address", "block_number", "amount", "transaction_hash", "removed")
    logs.createOrReplaceTempView("gql_logs")
  }

  test("parse + compile: condition, pagination, ordering become one SQL statement") {
    registerFixture()
    val Seq(f) = GraphQL.parse(
      """query Probe {
        |  gql_logs(condition: {address: "0xaaa", removed: false},
        |           first: 10, offset: 1, orderBy: "block_number", desc: true)
        |  { block_number amount }
        |}""".stripMargin)
    val sql = GraphQL.compile(spark, f)
    assert(sql === "select `block_number`, `amount` from `gql_logs`" +
      " where `address` = '0xaaa' and `removed` = false" +
      " order by `block_number` desc limit 10 offset 1")
    val rows = spark.sql(sql).as[(Long, Long)].collect()
    assert(rows.toSeq === Seq((10L, 3L))) // 11 skipped by offset, desc order
  }

  test("execute returns the GraphQL connection shape with data") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xbbb"}, orderBy: "block_number")
        |  { block_number transaction_hash removed } }""".stripMargin))
    val conn = resp.get("data").get("gql_logs")
    assert(conn.get("totalCount").asInt === 2)
    val nodes = conn.get("nodes")
    assert(nodes.get(0).get("block_number").asLong === 12L)
    assert(nodes.get(0).get("transaction_hash").asText === "t3")
    assert(nodes.get(1).get("removed").asBoolean === true)
  }

  test("unknown views/fields and malformed queries are errors, not SQL") {
    registerFixture()
    def errOf(q: String): String =
      mapper.readTree(GraphQL.execute(spark, q))
        .get("errors").get(0).get("message").asText
    assert(errOf("{ nosuch { a } }").contains("unknown table or view"))
    assert(errOf("{ gql_logs { nosuch_field } }").contains("no field"))
    assert(errOf("{ gql_logs { } }").contains("empty selection"))
    assert(errOf("{{{").nonEmpty)
    // a hostile string value stays a literal: no rows, no error
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "x' or '1'='1"}) { block_number } }"""))
    assert(resp.get("data").get("gql_logs").get("totalCount").asInt === 0)
  }

  test("parser never throws anything but ParseError on fuzzed input") {
    registerFixture()
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "{}():,\"abc_ 123\\#\n\ttrue"
    (1 to 500).foreach { _ =>
      val q = Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try GraphQL.parse(q)
      catch { case _: GraphQL.ParseError => () } // the only permitted failure
      // and the full execute path always yields well-formed JSON
      val resp = mapper.readTree(GraphQL.execute(spark, q))
      assert(resp.has("data") || resp.has("errors"))
    }
  }

  test("page size is bounded: default first, max clamp, real totalCount") {
    // 500-row view; a query that omits `first` must NOT collect it all
    spark.range(500).selectExpr("id", "id % 7 as grp")
      .createOrReplaceTempView("gql_big")
    // no `first` → defaultFirst page, totalCount still the full count
    val r1 = mapper.readTree(GraphQL.execute(spark,
      "{ gql_big(orderBy: \"id\") { id } }", defaultFirst = 25, maxFirst = 50))
    val c1 = r1.get("data").get("gql_big")
    assert(c1.get("nodes").size === 25)
    assert(c1.get("totalCount").asLong === 500L)
    // over-cap `first` is clamped to maxFirst
    val r2 = mapper.readTree(GraphQL.execute(spark,
      "{ gql_big(first: 100000) { id } }", defaultFirst = 25, maxFirst = 50))
    val c2 = r2.get("data").get("gql_big")
    assert(c2.get("nodes").size === 50)
    assert(c2.get("totalCount").asLong === 500L)
    // the compiled SQL always carries a LIMIT, even with no `first`
    val Seq(f) = GraphQL.parse("{ gql_big { id } }")
    assert(GraphQL.compile(spark, f).endsWith(s"limit ${GraphQL.DefaultPageSize}"))
    // negative first/offset are parse errors, not SQL
    val err = mapper.readTree(GraphQL.execute(spark, "{ gql_big(first: -1) { id } }"))
    assert(err.get("errors").get(0).get("message").asText.contains("non-negative"))
    // totalCount respects the condition's WHERE, not the whole table
    val r3 = mapper.readTree(GraphQL.execute(spark,
      "{ gql_big(condition: {grp: 3}, first: 5) { id } }"))
    val c3 = r3.get("data").get("gql_big")
    assert(c3.get("nodes").size === 5)
    assert(c3.get("totalCount").asLong === 71L) // ids 3,10,…,493 → 71 matches
  }

  test("string escapes decode per the GraphQL spec; unknown escapes error") {
    Seq(("a\nb", 1L), ("a\tb", 2L), ("aßb", 3L))
      .toDF("k", "v").createOrReplaceTempView("gql_esc")
    def one(cond: String): Long = {
      val resp = mapper.readTree(GraphQL.execute(spark,
        s"""{ gql_esc(condition: {k: "$cond"}) { v } }"""))
      val nodes = resp.get("data").get("gql_esc").get("nodes")
      assert(nodes.size === 1, s"for $cond: $resp")
      nodes.get(0).get("v").asLong
    }
    assert(one("a\\nb") === 1L)     // \n is a newline, not the letter n
    assert(one("a\\tb") === 2L)
    assert(one("a\\u00dfb") === 3L) // \uXXXX decodes
    intercept[GraphQL.ParseError](GraphQL.parse("""{ v(condition: {k: "\q"}) { v } }"""))
    // (concat dodges Scala's own pre-lexer \u processing)
    val badU = """{ v(condition: {k: "\""" + """uZZZZ"}) { v } }"""
    intercept[GraphQL.ParseError](GraphQL.parse(badU))
  }

  test("request body dispatch honors Content-Type; pretty JSON parses") {
    val pretty = "{\n  \"query\": \"{ x { y } }\"\n}"
    assert(GraphQL.extractQuery(Some("application/json"), pretty) === "{ x { y } }")
    // no header: JSON envelope detected even pretty-printed
    assert(GraphQL.extractQuery(None, pretty) === "{ x { y } }")
    // application/graphql: body IS the document, even if it looks like JSON
    assert(GraphQL.extractQuery(Some("application/graphql"), "{ x { y } }") === "{ x { y } }")
    // raw document with no header falls through unchanged
    assert(GraphQL.extractQuery(None, "query { x { y } }") === "query { x { y } }")
    // json header with charset parameter still dispatches as json
    assert(GraphQL.extractQuery(Some("application/json; charset=utf-8"), pretty) === "{ x { y } }")
  }

  test("multiple root fields execute in one document") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}) { block_number }
        |  gql_logs(first: 1, orderBy: "block_number") { transaction_hash } }""".stripMargin))
    // later same-name fields overwrite in the data map (documented
    // simplification vs GraphQL aliases); both executed without error
    assert(resp.get("data").has("gql_logs"))
    assert(!resp.has("errors"))
  }

  test("cursor pagination: edges + pageInfo walk the whole view without overlap") {
    spark.range(95).selectExpr("id").createOrReplaceTempView("gql_walk")
    var after = ""
    val seen = scala.collection.mutable.ListBuffer[Long]()
    var hasNext = true
    var pages = 0
    while (hasNext && pages < 20) {
      val afterArg = if (after.isEmpty) "" else s""", after: "$after""""
      val resp = mapper.readTree(GraphQL.execute(spark,
        s"""{ gql_walk(first: 30, orderBy: "id"$afterArg)
          |  { edges { cursor node { id } }
          |    pageInfo { hasNextPage hasPreviousPage startCursor endCursor } } }""".stripMargin))
      assert(!resp.has("errors"), resp.toString)
      val conn = resp.get("data").get("gql_walk")
      val edges = conn.get("edges")
      (0 until edges.size).foreach(i => seen += edges.get(i).get("node").get("id").asLong)
      val pi = conn.get("pageInfo")
      assert(pi.get("hasPreviousPage").asBoolean === (pages > 0))
      // the last edge's cursor IS pageInfo.endCursor
      if (edges.size > 0)
        assert(edges.get(edges.size - 1).get("cursor").asText === pi.get("endCursor").asText)
      hasNext = pi.get("hasNextPage").asBoolean
      after = pi.get("endCursor").asText
      pages += 1
    }
    // 95 rows at page size 30 → 4 pages, every id exactly once, in order
    assert(pages === 4)
    assert(seen.toSeq === (0L until 95L))
    // cursors are opaque: a fabricated one errors instead of guessing
    val bad = mapper.readTree(GraphQL.execute(spark,
      """{ gql_walk(after: "garbage!") { id } }"""))
    assert(bad.get("errors").get(0).get("message").asText.contains("malformed cursor"))
  }

  test("nodes-explicit connection form selects the same columns") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}, orderBy: "block_number")
        |  { nodes { block_number amount } totalCount } }""".stripMargin))
    val conn = resp.get("data").get("gql_logs")
    assert(conn.get("totalCount").asInt === 2)
    assert(conn.get("nodes").get(0).get("amount").asLong === 3L)
  }

  test("introspection: __schema lists catalog types, __type resolves one") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ __schema { queryType { name }
        |    types { name kind fields { name type { name kind ofType { name kind } } } } } }""".stripMargin))
    assert(!resp.has("errors"), resp.toString)
    val schema = resp.get("data").get("__schema")
    assert(schema.get("queryType").get("name").asText === "Query")
    val types = schema.get("types")
    val names = (0 until types.size).map(i => types.get(i).get("name").asText)
    assert(names.contains("gql_logs"))
    val t = types.get(names.indexOf("gql_logs"))
    assert(t.get("kind").asText === "OBJECT")
    val fields = t.get("fields")
    val fnames = (0 until fields.size).map(i => fields.get(i).get("name").asText)
    assert(fnames === Seq("address", "block_number", "amount", "transaction_hash", "removed"))
    // nullable column → named type directly (chain terminates: ofType null)
    assert(fields.get(0).get("type").get("name").asText === "String")
    assert(fields.get(0).get("type").get("ofType").isNull)
    // non-nullable primitive → anonymous NON_NULL wrapper, named inside
    val bn = fields.get(1).get("type")
    assert(bn.get("kind").asText === "NON_NULL")
    assert(bn.get("name").isNull)
    assert(bn.get("ofType").get("name").asText === "BigInt")
    val rm = fields.get(4).get("type")
    assert(rm.get("kind").asText === "NON_NULL")
    assert(rm.get("ofType").get("name").asText === "Boolean")

    val one = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_logs") { name fields { name type { name } } } }"""))
    val tt = one.get("data").get("__type")
    assert(tt.get("name").asText === "gql_logs")
    assert(tt.get("fields").size === 5)
    // unknown type name resolves to null, per the GraphQL contract
    val none = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "nope") { name } }"""))
    assert(none.get("data").get("__type").isNull)
  }

  test("@skip/@include directives: literals, variables, and boundary errors") {
    registerFixture()
    // literal @skip removes a column from the projection
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}, orderBy: "block_number")
        |  { block_number amount @skip(if: true) removed @include(if: true) } }""".stripMargin))
    assert(!resp.has("errors"), resp.toString)
    val n0 = resp.get("data").get("gql_logs").get("nodes").get(0)
    assert(n0.has("block_number") && n0.has("removed") && !n0.has("amount"))
    // variable-driven @include, declared with a default that the
    // provided value overrides
    def withVar(v: Boolean) = mapper.readTree(GraphQL.execute(spark,
      """query Q($withAmount: Boolean! = false) {
        |  gql_logs(first: 1, orderBy: "block_number")
        |  { block_number amount @include(if: $withAmount) } }""".stripMargin,
      variables = Map("withAmount" -> v)))
    assert(withVar(true).get("data").get("gql_logs").get("nodes").get(0).has("amount"))
    assert(!withVar(false).get("data").get("gql_logs").get("nodes").get(0).has("amount"))
    // declaration default applies when the variable isn't provided
    val dflt = mapper.readTree(GraphQL.execute(spark,
      """query Q($withAmount: Boolean! = false) {
        |  gql_logs(first: 1) { block_number amount @include(if: $withAmount) } }""".stripMargin))
    assert(!dflt.get("data").get("gql_logs").get("nodes").get(0).has("amount"))
    // a document whose only root is skipped is valid: data == {}
    val root = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(first: 1) @skip(if: true) { block_number } }"""))
    assert(!root.has("errors"), root.toString)
    assert(root.get("data").size === 0)
    // stated boundaries: emptied selection set, unknown directive,
    // non-boolean/missing if:, undefined variable
    def errOf(q: String): String = {
      val r = mapper.readTree(GraphQL.execute(spark, q))
      assert(r.has("errors"), s"expected error for $q")
      r.get("errors").get(0).get("message").asText
    }
    assert(errOf("""{ gql_logs(first: 1) { block_number @skip(if: true) } }""")
      .contains("selection set empty"))
    assert(errOf("""{ gql_logs(first: 1) @wat(if: true) { block_number } }""")
      .contains("unsupported directive"))
    assert(errOf("""{ gql_logs(first: 1) { block_number @skip } }""")
      .contains("Boolean if:"))
    assert(errOf("""{ gql_logs(first: 1) { block_number @skip(if: 3) } }""")
      .contains("Boolean if:"))
    assert(errOf("""{ gql_logs(first: 1) { block_number @skip(if: $nope) } }""")
      .contains("undefined variable"))
  }

  test("variables flow into arguments and condition objects") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """query Q($addr: String, $n: Int, $cond: LogCondition) {
        |  gql_logs(condition: {address: $addr}, first: $n, orderBy: "block_number")
        |  { block_number } }""".stripMargin,
      variables = Map("addr" -> "0xbbb", "n" -> 1L)))
    assert(!resp.has("errors"), resp.toString)
    val nodes = resp.get("data").get("gql_logs").get("nodes")
    assert(nodes.size === 1)
    assert(nodes.get(0).get("block_number").asLong === 12L)
    // a whole condition object via one variable
    val viaObj = mapper.readTree(GraphQL.execute(spark,
      """query Q($c: LogCondition) {
        |  gql_logs(condition: $c, orderBy: "block_number") { block_number } }""".stripMargin,
      variables = Map("c" -> Seq("address" -> "0xaaa", "removed" -> false))))
    assert(!viaObj.has("errors"), viaObj.toString)
    assert(viaObj.get("data").get("gql_logs").get("totalCount").asInt === 2)
  }

  test("declared variable types are enforced graphql-js-style") {
    registerFixture()
    def errOf(q: String, vars: Map[String, Any] = Map.empty): String = {
      val r = mapper.readTree(GraphQL.execute(spark, q, variables = vars))
      assert(r.has("errors"), r.toString)
      r.get("errors").get(0).get("message").asText
    }
    // missing required (NON_NULL, no default) → "was not provided"
    val miss = errOf(
      """query Q($a: String!) { gql_logs(condition: {address: $a}) { block_number } }""")
    assert(miss.contains("required type") && miss.contains("was not provided"), miss)
    // explicit null into NON_NULL → "must not be null"
    val nul = errOf(
      """query Q($a: String!) { gql_logs(condition: {address: $a}) { block_number } }""",
      Map("a" -> null))
    assert(nul.contains("must not be null"), nul)
    // wrong kind: string into Int, number into String, number into Boolean
    val k1 = errOf(
      """query Q($n: Int) { gql_logs(first: $n) { block_number } }""",
      Map("n" -> "three"))
    assert(k1.contains("invalid value") && k1.contains("Int"), k1)
    val k2 = errOf(
      """query Q($a: String) { gql_logs(condition: {address: $a}) { block_number } }""",
      Map("a" -> 7L))
    assert(k2.contains("invalid value") && k2.contains("String"), k2)
    val k3 = errOf(
      """query Q($s: Boolean) { gql_logs(condition: {removed: $s}) { block_number } }""",
      Map("s" -> 1L))
    assert(k3.contains("invalid value") && k3.contains("Boolean"), k3)
    // a scalar into a Condition input-object type
    val k4 = errOf(
      """query Q($c: GqlLogsCondition) { gql_logs(condition: $c) { block_number } }""",
      Map("c" -> "0xaaa"))
    assert(k4.contains("invalid value"), k4)
    // using a variable the header didn't declare: a typo'd name must
    // not silently resolve through a spare JSON entry
    val undef = errOf(
      """query Q($a: String) { gql_logs(condition: {address: $b}) { block_number } }""",
      Map("a" -> "0xaaa", "b" -> "0xbbb"))
    assert(undef.contains("not defined by operation"), undef)
    // valid values still flow: NON_NULL satisfied, Int accepts a
    // whole JSON double (graphql-js), defaults still fill
    val ok = mapper.readTree(GraphQL.execute(spark,
      """query Q($a: String!, $n: Int = 1) {
        |  gql_logs(condition: {address: $a}, first: $n, orderBy: "block_number")
        |  { block_number } }""".stripMargin,
      variables = Map("a" -> "0xbbb")))
    assert(!ok.has("errors"), ok.toString)
    assert(ok.get("data").get("gql_logs").get("nodes").size === 1)
    val whole = mapper.readTree(GraphQL.execute(spark,
      """query Q($n: Int) { gql_logs(first: $n) { block_number } }""",
      variables = Map("n" -> 2.0)))
    assert(!whole.has("errors"), whole.toString)
    // list coercion through the HTTP JSON path: an array validates
    // against [String], a single value coerces to the 1-element list,
    // and a wrong-kind ELEMENT is caught
    val (ql, varsl) = GraphQL.extractQueryAndVars(Some("application/json"),
      """{"query": "query Q($xs: [String]) { gql_logs { block_number } }",
        | "variables": {"xs": ["a", "b"]}}""".stripMargin)
    val lst = mapper.readTree(GraphQL.execute(spark, ql, variables = varsl))
    assert(!lst.has("errors"), lst.toString)
    val single = mapper.readTree(GraphQL.execute(spark,
      """query Q($xs: [String]) { gql_logs { block_number } }""",
      variables = Map("xs" -> "solo")))
    assert(!single.has("errors"), single.toString)
    val (qb, varsb) = GraphQL.extractQueryAndVars(Some("application/json"),
      """{"query": "query Q($xs: [Int]) { gql_logs { block_number } }",
        | "variables": {"xs": [1, "two"]}}""".stripMargin)
    val bad = mapper.readTree(GraphQL.execute(spark, qb, variables = varsb))
    assert(bad.has("errors"), bad.toString)
    assert(bad.get("errors").get(0).get("message").asText.contains("Int"))
  }

  test("__schema directives listing and HTTP variables member") {
    registerFixture()
    val d = mapper.readTree(GraphQL.execute(spark,
      """{ __schema { directives { name locations args { name } } } }"""))
    assert(!d.has("errors"), d.toString)
    val ds = d.get("data").get("__schema").get("directives")
    val dnames = (0 until ds.size).map(i => ds.get(i).get("name").asText)
    assert(dnames === Seq("skip", "include"))
    assert(ds.get(0).get("locations").get(0).asText === "FIELD")
    assert(ds.get(0).get("args").get(0).get("name").asText === "if")
    // the standard JSON body shape: query + variables members
    val (q, vars) = GraphQL.extractQueryAndVars(Some("application/json"),
      """{"query": "query Q($a: String) { gql_logs(condition: {address: $a}) { block_number } }",
        | "variables": {"a": "0xaaa", "obj": {"k": 1}, "none": null}}""".stripMargin)
    assert(q.startsWith("query Q"))
    assert(vars("a") === "0xaaa")
    assert(vars("obj") === Seq("k" -> 1L))
    assert(vars("none") === null)
    val resp = mapper.readTree(GraphQL.execute(spark, q, variables = vars))
    assert(!resp.has("errors"), resp.toString)
    assert(resp.get("data").get("gql_logs").get("totalCount").asInt === 2)
  }

  test("aliases: same view twice at root, column re-keyed, introspection key") {
    registerFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ aaa: gql_logs(condition: {address: "0xaaa"}) { bn: block_number amount }
        |  bbb: gql_logs(condition: {address: "0xbbb"}) { block_number } }""".stripMargin))
    assert(!resp.has("errors"), resp.toString)
    val d = resp.get("data")
    assert(d.get("aaa").get("totalCount").asInt === 2)
    assert(d.get("bbb").get("totalCount").asInt === 2)
    // column alias renders under the alias key, value from the column
    assert(d.get("aaa").get("nodes").get(0).get("bn").asLong === 10L)
    assert(!d.get("aaa").get("nodes").get(0).has("block_number"))
    // the same column under TWO keys: projection repeats it
    val two = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(first: 1, orderBy: "block_number") { a: amount b: amount } }"""))
    assert(!two.has("errors"), two.toString)
    val n0 = two.get("data").get("gql_logs").get("nodes").get(0)
    assert(n0.get("a").asLong === n0.get("b").asLong)
    // aliased introspection root
    val intro = mapper.readTree(GraphQL.execute(spark,
      """{ t: __type(name: "gql_logs") { name } }"""))
    assert(intro.get("data").get("t").get("name").asText === "gql_logs")
  }

  test("fragments: named (forward ref, nested, on spreads), inline, cycles") {
    registerFixture()
    // named fragment defined AFTER the operation; referenced twice;
    // fragment referencing another fragment
    val resp = mapper.readTree(GraphQL.execute(spark,
      """query Q {
        |  gql_logs(condition: {address: "0xaaa"}, orderBy: "block_number")
        |  { ...core removed }
        |}
        |fragment core on gql_logs { ...ids amount }
        |fragment ids on gql_logs { block_number transaction_hash }""".stripMargin))
    assert(!resp.has("errors"), resp.toString)
    val n0 = resp.get("data").get("gql_logs").get("nodes").get(0)
    assert(n0.has("block_number") && n0.has("transaction_hash") &&
      n0.has("amount") && n0.has("removed"))
    // inline fragment splices its selections
    val inl = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(first: 1) { ... on gql_logs { block_number } amount } }"""))
    assert(!inl.has("errors"), inl.toString)
    assert(inl.get("data").get("gql_logs").get("nodes").get(0).has("block_number"))
    // @skip on a spread drops the whole fragment's fields
    val sk = mapper.readTree(GraphQL.execute(spark,
      """query Q($s: Boolean!) { gql_logs(first: 1) { ...core @skip(if: $s) amount } }
        |fragment core on gql_logs { block_number }""".stripMargin,
      variables = Map("s" -> true)))
    assert(!sk.has("errors"), sk.toString)
    assert(!sk.get("data").get("gql_logs").get("nodes").get(0).has("block_number"))
    // error surfaces: unknown fragment, cycle
    def errOf(q: String): String = {
      val r = mapper.readTree(GraphQL.execute(spark, q))
      assert(r.has("errors"), s"expected error for $q")
      r.get("errors").get(0).get("message").asText
    }
    assert(errOf("""{ gql_logs(first: 1) { ...nope } }""").contains("unknown fragment"))
    assert(errOf(
      """query Q { gql_logs(first: 1) { ...a } }
        |fragment a on gql_logs { ...b }
        |fragment b on gql_logs { ...a }""".stripMargin).contains("fragment cycle"))
  }

  test("fragment type conditions dispatch: concrete-type equality, relation child types") {
    registerFixture()
    Seq(("0xaaa", 5L, 1.0), ("0xbbb", 5L, 9.0))
      .toDF("address", "pblock", "price_usd").createOrReplaceTempView("gql_price")
    val rels: GraphQL.Relations = Map(
      "gql_logs" -> Map("prices" -> GraphQL.Relation("gql_price", "address", "address")))
    def errOf(q: String): String = {
      val r = mapper.readTree(GraphQL.execute(spark, q, relations = rels))
      assert(r.has("errors"), s"expected error for $q")
      r.get("errors").get(0).get("message").asText
    }
    // a condition naming a DIFFERENT concrete type can never apply —
    // validation error (rule 5.5.2.3), not a silent splice (the r7 bug)
    assert(errOf("""{ gql_logs(first: 1) { ... on gql_price { address } } }""")
      .contains("can never apply"))
    assert(errOf(
      """query Q { gql_logs(first: 1) { ...f } }
        |fragment f on gql_price { address }""".stripMargin)
      .contains("can never apply"))
    // matching conditions apply — case-insensitively (Spark's own
    // view-name resolution convention), inside connection shells too
    val ok = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(first: 1) {
        |  ... on GQL_LOGS { amount }
        |  nodes { ... on gql_logs { block_number } } } }""".stripMargin,
      relations = rels))
    assert(!ok.has("errors"), ok.toString)
    assert(ok.get("data").get("gql_logs").get("nodes").get(0).has("block_number"))
    // a relation selection's context is the CHILD view: its own name
    // applies, the parent's errors
    val rel = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(first: 1) { block_number
        |    prices { ... on gql_price { pblock } } } }""".stripMargin,
      relations = rels))
    assert(!rel.has("errors"), rel.toString)
    assert(rel.get("data").get("gql_logs").get("nodes").get(0)
      .get("prices").get(0).has("pblock"))
    assert(errOf(
      """{ gql_logs(first: 1) { block_number
        |    prices { ... on gql_logs { pblock } } } }""".stripMargin)
      .contains("can never apply"))
    // root-level spreads sit in Query
    val q = mapper.readTree(GraphQL.execute(spark,
      """{ ... on Query { gql_logs(first: 1) { amount } } }""",
      relations = rels))
    assert(!q.has("errors"), q.toString)
    assert(errOf("""{ ... on gql_logs { gql_logs(first: 1) { amount } } }""")
      .contains("can never apply"))
  }

  test("nested relations: one bounded child query per page, grouped per parent") {
    registerFixture()
    Seq(("0xaaa", 5L, 1.0), ("0xaaa", 6L, 2.0), ("0xaaa", 7L, 3.0),
        ("0xbbb", 5L, 9.0))
      .toDF("address", "pblock", "price_usd").createOrReplaceTempView("gql_price")
    val rels: GraphQL.Relations = Map(
      "gql_logs" -> Map("prices" -> GraphQL.Relation("gql_price", "address", "address")))
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(orderBy: "block_number")
        |  { block_number address
        |    prices(orderBy: "pblock", desc: true, first: 2) { pblock price_usd } } }""".stripMargin,
      relations = rels))
    assert(!resp.has("errors"), resp.toString)
    val nodes = resp.get("data").get("gql_logs").get("nodes")
    assert(nodes.size === 4)
    // 0xaaa parents carry the TOP-2 prices by pblock desc (7, 6) — the
    // per-parent row_number cap, not a truncation of the whole child set
    val aaa = nodes.get(0).get("prices")
    assert(aaa.size === 2)
    assert(aaa.get(0).get("pblock").asLong === 7L)
    assert(aaa.get(1).get("pblock").asLong === 6L)
    // 0xbbb parent gets ONLY its own row
    val bbb = nodes.get(2).get("prices")
    assert(bbb.size === 1)
    assert(bbb.get(0).get("price_usd").asDouble === 9.0)
    // child condition narrows inside the relation
    val cond = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}, first: 1, orderBy: "block_number")
        |  { block_number prices(condition: {pblock: 6}) { price_usd } } }""".stripMargin,
      relations = rels))
    val p = cond.get("data").get("gql_logs").get("nodes").get(0).get("prices")
    assert(p.size === 1 && p.get(0).get("price_usd").asDouble === 2.0)
    // unknown relation name is an error naming the known ones
    val err = mapper.readTree(GraphQL.execute(spark,
      "{ gql_logs { block_number nope { x } } }", relations = rels))
    assert(err.get("errors").get(0).get("message").asText.contains("no relation"))
    // relations are never selectable without a registry entry
    val bare = mapper.readTree(GraphQL.execute(spark,
      "{ gql_logs { block_number prices { pblock } } }"))
    assert(bare.get("errors").get(0).get("message").asText.contains("no relation"))
  }

  test("deriveRelations: key-column convention wires nested queries with no manual registry") {
    registerFixture()
    Seq(("0xaaa", 5L, 1.0), ("0xaaa", 6L, 2.0), ("0xbbb", 5L, 9.0))
      .toDF("address", "pblock", "price_usd").createOrReplaceTempView("gql_price")
    // decode-alias parent: carries contract_address, not address
    Seq(("0xaaa", 10L, 77L))
      .toDF("contract_address", "evt_block_number", "amount")
      .createOrReplaceTempView("gql_decoded")
    // one declaration — child gql_price keyed by address — and every
    // catalog view carrying the key (or contract_<key>) gets the
    // relation field `gql_prices`; nothing enumerated per view
    val rels = GraphQL.deriveRelations(spark, Seq(("gql_price", "address")))
    assert(rels.contains("gql_logs"))
    assert(rels("gql_logs")("gql_prices") ===
      GraphQL.Relation("gql_price", "address", "address"))
    assert(rels("gql_decoded")("gql_prices") ===
      GraphQL.Relation("gql_price", "contract_address", "address"))
    assert(!rels.contains("gql_price")) // never its own parent
    // and the derived registry actually serves a nested query
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}, first: 1, orderBy: "block_number")
        |  { block_number gql_prices(orderBy: "pblock") { pblock price_usd } } }""".stripMargin,
      relations = rels))
    assert(!resp.has("errors"), resp.toString)
    val p = resp.get("data").get("gql_logs").get("nodes").get(0).get("gql_prices")
    assert(p.size === 2)
    assert(p.get(0).get("pblock").asLong === 5L)
    val dec = mapper.readTree(GraphQL.execute(spark,
      """{ gql_decoded { amount gql_prices(first: 1, orderBy: "pblock", desc: true) { price_usd } } }""",
      relations = rels))
    assert(!dec.has("errors"), dec.toString)
    assert(dec.get("data").get("gql_decoded").get("nodes").get(0)
      .get("gql_prices").get(0).get("price_usd").asDouble === 2.0)
    // loud failures: unknown child, missing key column
    intercept[GraphQL.ParseError](
      GraphQL.deriveRelations(spark, Seq(("nosuch_view", "address"))))
    intercept[GraphQL.ParseError](
      GraphQL.deriveRelations(spark, Seq(("gql_price", "nosuch_key"))))
  }

  test("aliases inside relations render under the alias; connection keys reject aliases") {
    registerFixture()
    Seq(("0xaaa", 5L, 1.0), ("0xaaa", 6L, 2.0), ("0xbbb", 5L, 9.0))
      .toDF("address", "pblock", "price_usd").createOrReplaceTempView("gql_price")
    val rels: GraphQL.Relations = Map(
      "gql_logs" -> Map("prices" -> GraphQL.Relation("gql_price", "address", "address")))
    // r7 accepted `key: field` inside a relation but rendered under the
    // COLUMN name — the alias must now be the response key, including
    // the same column under TWO keys (positional projection)
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(condition: {address: "0xaaa"}, first: 1, orderBy: "block_number")
        |  { block_number
        |    px: prices(orderBy: "pblock", desc: true, first: 1)
        |      { blk: pblock usd: price_usd usd2: price_usd } } }""".stripMargin,
      relations = rels))
    assert(!resp.has("errors"), resp.toString)
    val p0 = resp.get("data").get("gql_logs").get("nodes").get(0).get("px").get(0)
    assert(p0.get("blk").asLong === 6L)
    assert(!p0.has("pblock") && !p0.has("price_usd"))
    assert(p0.get("usd").asDouble === 2.0)
    assert(p0.get("usd2").asDouble === 2.0)
    // connection-shape keys reject aliases loudly (r7 dropped them)
    def errOf(q: String): String = {
      val r = mapper.readTree(GraphQL.execute(spark, q))
      assert(r.has("errors"), s"expected error for $q")
      r.get("errors").get(0).get("message").asText
    }
    assert(errOf("""{ gql_logs(first: 1) { pageInfo { hnp: hasNextPage } } }""")
      .contains("alias"))
    assert(errOf("""{ gql_logs(first: 1) { ns: nodes { block_number } } }""")
      .contains("alias"))
    assert(errOf("""{ gql_logs(first: 1) { tc: totalCount nodes { block_number } } }""")
      .contains("alias"))
    assert(errOf("""{ gql_logs(first: 1) { edges { c: cursor node { amount } } } }""")
      .contains("alias"))
  }

  test("subscriptions reject query-only connection features") {
    val hub = new graft.serving.Subscriptions.Hub()
    intercept[GraphQL.ParseError](
      hub.subscribe("subscription { logs { address prices { x } } }"))
    intercept[GraphQL.ParseError](
      hub.subscribe("subscription { logs { edges { node { address } } } }"))
    intercept[GraphQL.ParseError](
      hub.subscribe("""subscription { logs(after: "x") { address } }"""))
  }

  test("serves the decoded reference views end-to-end over HTTP") {
    // synthetic Transfer logs → registered views → HTTP round-trip,
    // the full E3 path (docker-compose.yaml:46-72 analog)
    val sig = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    val logs = spark.range(1, 21).select(
      format_string("0x%040x", col("id") % 3).as("address"),
      lit(sig).as("topic0"),
      format_string("0x%064x", col("id")).as("topic1"),
      format_string("0x%064x", col("id") * 7).as("topic2"),
      lit(null).cast("string").as("topic3"),
      format_string("0x%064x", col("id") * 31).as("data"),
      format_string("0xb%x", col("id")).as("block_hash"),
      col("id").as("block_number"),
      format_string("0xt%x", col("id")).as("transaction_hash"),
      lit(0L).as("transaction_index"),
      lit(0L).as("log_index"),
      lit(false).as("removed"),
      lit(null).cast("timestamp").as("block_timestamp"))
    graft.operators.EventViews.registerAll(spark, logs)
    val server = GraphQL.serve(spark, 0)
    try {
      val port = server.getAddress.getPort
      val view = graft.operators.EventViews.referenceViews
        .find(_.viewName.startsWith("Transfer")).get.viewName
      val http = java.net.http.HttpClient.newHttpClient()
      val q = s"""{"query": "{ $view(condition: {contract_address: \\"0x${"0" * 39}1\\"}, orderBy: \\"evt_block_number\\", first: 2) { amount evt_block_number } }"}"""
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/graphql"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(q)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val conn = mapper.readTree(resp.body()).get("data").get(view)
      // totalCount is the FULL match count (ids 1,4,…,19 → 7 rows),
      // not the page length — Postgraphile connection semantics
      assert(conn.get("totalCount").asInt === 7)
      assert(conn.get("nodes").size === 2)
      // ids 1,4,7,… have address 0x…1; first two by block: 1 and 4
      assert(conn.get("nodes").get(0).get("evt_block_number").asLong === 1L)
      assert(conn.get("nodes").get(0).get("amount").asText === "31")
      assert(conn.get("nodes").get(1).get("amount").asText === "124")
    } finally server.stop(0)
  }

  private def registerUnionFixture(): GraphQL.Unions = {
    Seq(("0xaaa", 10L, 3L), ("0xbbb", 12L, 7L))
      .toDF("address", "block_number", "amount")
      .createOrReplaceTempView("gql_transfers")
    Seq(("0xccc", 11L, "0xd1"), ("0xddd", 13L, "0xd2"))
      .toDF("address", "block_number", "spender")
      .createOrReplaceTempView("gql_approvals")
    Map("gql_events" -> Seq("gql_transfers", "gql_approvals"))
  }

  test("unions: per-row __typename dispatch, cross-member order, shared-column condition") {
    val unions = registerUnionFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events(orderBy: "block_number", first: 3) {
        |    totalCount
        |    nodes {
        |      __typename
        |      ... on gql_transfers { amount }
        |      ... on gql_approvals { spender address }
        |    } } }""".stripMargin, unions = unions))
    assert(resp.get("errors") == null, resp.toString)
    val conn = resp.get("data").get("gql_events")
    assert(conn.get("totalCount").asInt === 4)
    val nodes = conn.get("nodes")
    assert(nodes.size === 3)
    // block order interleaves the members: 10(t) 11(a) 12(t)
    assert(nodes.get(0).get("__typename").asText === "gql_transfers")
    assert(nodes.get(0).get("amount").asLong === 3L)
    assert(nodes.get(0).get("spender") == null) // only the row's own member renders
    assert(nodes.get(1).get("__typename").asText === "gql_approvals")
    assert(nodes.get(1).get("spender").asText === "0xd1")
    assert(nodes.get(1).get("address").asText === "0xccc")
    assert(nodes.get(2).get("__typename").asText === "gql_transfers")
    assert(nodes.get(2).get("amount").asLong === 7L)
    // a condition on a shared column filters EVERY member
    val cond = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events(condition: {address: "0xccc"}) {
        |    totalCount nodes { __typename } } }""".stripMargin, unions = unions))
    val cconn = cond.get("data").get("gql_events")
    assert(cconn.get("totalCount").asInt === 1)
    assert(cconn.get("nodes").get(0).get("__typename").asText === "gql_approvals")
  }

  test("unions: edges/cursor pagination and pageInfo work across members") {
    val unions = registerUnionFixture()
    val p1 = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events(orderBy: "block_number", first: 2) {
        |    edges { cursor node { __typename ... on gql_approvals { spender } } }
        |    pageInfo { hasNextPage endCursor } } }""".stripMargin, unions = unions))
    assert(p1.get("errors") == null, p1.toString)
    val conn1 = p1.get("data").get("gql_events")
    assert(conn1.get("pageInfo").get("hasNextPage").asBoolean === true)
    assert(conn1.get("edges").size === 2)
    assert(conn1.get("edges").get(1).get("node").get("spender").asText === "0xd1")
    val after = conn1.get("pageInfo").get("endCursor").asText
    val p2 = mapper.readTree(GraphQL.execute(spark,
      s"""{ gql_events(orderBy: "block_number", first: 2, after: "$after") {
         |    nodes { __typename ... on gql_transfers { amount } }
         |    pageInfo { hasNextPage } } }""".stripMargin, unions = unions))
    val conn2 = p2.get("data").get("gql_events")
    assert(conn2.get("nodes").size === 2) // blocks 12(t), 13(a)
    assert(conn2.get("nodes").get(0).get("amount").asLong === 7L)
    assert(conn2.get("pageInfo").get("hasNextPage").asBoolean === false)
  }

  test("unions: named fragments retain per-member, nested conditions dispatch against the member") {
    val unions = registerUnionFixture()
    val resp = mapper.readTree(GraphQL.execute(spark,
      """query { gql_events(orderBy: "block_number", first: 1) { nodes { ...T } } }
        |fragment T on gql_transfers { amount ... on gql_transfers { address } }
        |""".stripMargin, unions = unions))
    assert(resp.get("errors") == null, resp.toString)
    val node = resp.get("data").get("gql_events").get("nodes").get(0)
    assert(node.get("amount").asLong === 3L)
    assert(node.get("address").asText === "0xaaa") // nested inline fragment applied
    // a mismatched condition INSIDE a member fragment can never apply
    val bad = mapper.readTree(GraphQL.execute(spark,
      """query { gql_events { nodes { ...T } } }
        |fragment T on gql_transfers { ... on gql_approvals { spender } }
        |""".stripMargin, unions = unions))
    assert(bad.get("errors").get(0).get("message").asText.contains("can never apply"))
  }

  test("unions: non-members, bare fields, nested relations and unknown shared columns error") {
    val unions = registerUnionFixture()
    def errOf(q: String): String =
      mapper.readTree(GraphQL.execute(spark, q, unions = unions))
        .get("errors").get(0).get("message").asText
    assert(errOf("{ gql_events { nodes { ... on nosuch { address } } } }")
      .contains("not a member"))
    assert(errOf("{ gql_events { nodes { address } } }")
      .contains("__typename and inline fragments"))
    assert(errOf("{ gql_events { nodes { ... on gql_transfers { x { y } } } } }")
      .contains("no relation 'x'"))
    // amount exists only on gql_transfers: not a legal cross-member order
    assert(errOf("""{ gql_events(orderBy: "amount") { nodes { __typename } } }""")
      .contains("no field"))
    assert(errOf("""{ gql_events(condition: {amount: 3}) { nodes { __typename } } }""")
      .contains("no field"))
    assert(errOf("{ gql_events { amount } }")
      .contains("expected nodes/edges/pageInfo/totalCount"))
  }

  test("interfaces: bare shared fields render for every row, fragments narrow, errors teach") {
    val members = registerUnionFixture()("gql_events")
    val interfaces: GraphQL.Interfaces = Map("gql_feed" -> members)
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_feed(orderBy: "block_number", first: 3) {
        |    totalCount
        |    nodes {
        |      __typename
        |      block_number
        |      address
        |      ... on gql_transfers { amount }
        |    } } }""".stripMargin, interfaces = interfaces))
    assert(resp.get("errors") == null, resp.toString)
    val conn = resp.get("data").get("gql_feed")
    assert(conn.get("totalCount").asInt === 4)
    val nodes = conn.get("nodes")
    // bare interface fields render on EVERY row; the fragment only on its member
    assert(nodes.get(0).get("block_number").asLong === 10L)
    assert(nodes.get(0).get("address").asText === "0xaaa")
    assert(nodes.get(0).get("amount").asLong === 3L)
    assert(nodes.get(1).get("block_number").asLong === 11L)
    assert(nodes.get(1).get("address").asText === "0xccc")
    assert(nodes.get(1).get("amount") == null)
    assert(nodes.get(1).get("__typename").asText === "gql_approvals")
    // a bare field outside the intersection teaches, naming the members
    def errOf(q: String): String =
      mapper.readTree(GraphQL.execute(spark, q, interfaces = interfaces))
        .get("errors").get(0).get("message").asText
    val miss = errOf("""{ gql_feed { nodes { amount } } }""")
    assert(miss.contains("not an interface field") && miss.contains("gql_approvals"), miss)
    // conflicting member types for one name also teach
    Seq(("0xeee", 14L, "conflict")).toDF("address", "block_number", "amount")
      .createOrReplaceTempView("gql_str_amounts")
    val conflicted: GraphQL.Interfaces = Map("gql_feed" -> (members :+ "gql_str_amounts"))
    val tc = mapper.readTree(GraphQL.execute(spark,
      """{ gql_feed { nodes { ... on gql_transfers { amount } amount } } }""",
      interfaces = conflicted)).get("errors").get(0).get("message").asText
    assert(tc.contains("not an interface field") || tc.contains("disagree on the type"), tc)
  }

  test("interfaces: introspection derives fields, kind INTERFACE, and member back-references") {
    val members = registerUnionFixture()("gql_events")
    val interfaces: GraphQL.Interfaces = Map("gql_feed" -> members)
    val t = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_feed") { name kind possibleTypes { name }
        |    fields { name type { name kind } } } }""".stripMargin,
      interfaces = interfaces)).get("data").get("__type")
    assert(t.get("kind").asText === "INTERFACE")
    val fieldNames = (0 until t.get("fields").size)
      .map(i => t.get("fields").get(i).get("name").asText)
    // the derived intersection: address + block_number (amount/spender differ)
    assert(fieldNames.toSet === Set("address", "block_number"))
    assert(t.get("possibleTypes").size === 2)
    // members list the interface they implement
    val o = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_transfers") { name interfaces { name kind } } }""",
      interfaces = interfaces)).get("data").get("__type")
    assert(o.get("interfaces").size === 1)
    assert(o.get("interfaces").get(0).get("name").asText === "gql_feed")
    assert(o.get("interfaces").get(0).get("kind").asText === "INTERFACE")
  }

  test("condition input types introspect: kind INPUT_OBJECT with derived inputFields") {
    registerFixture()
    val t = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_logsCondition") { name kind fields
        |    inputFields { name type { name kind } } } }""".stripMargin))
      .get("data").get("__type")
    assert(t.get("kind").asText === "INPUT_OBJECT")
    assert(t.get("fields").isNull) // input objects carry inputFields, not fields
    val byName = (0 until t.get("inputFields").size)
      .map(i => t.get("inputFields").get(i))
      .map(n => n.get("name").asText -> n.get("type").get("name").asText).toMap
    assert(byName("address") === "String")
    assert(byName("block_number") === "BigInt")
    assert(byName("removed") === "Boolean")
    // the __schema types listing carries them too; unknown Condition
    // names still resolve to null
    val all = mapper.readTree(GraphQL.execute(spark,
      """{ __schema { types { name kind } } }"""))
      .get("data").get("__schema").get("types")
    val kinds = (0 until all.size).map(i =>
      all.get(i).get("name").asText -> all.get(i).get("kind").asText).toMap
    assert(kinds("gql_logsCondition") === "INPUT_OBJECT")
    assert(kinds("gql_logs") === "OBJECT")
    assert(mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "nosuchCondition") { name } }"""))
      .get("data").get("__type").isNull)
  }

  test("unions: introspection exposes kind UNION with possibleTypes; object types carry null") {
    val unions = registerUnionFixture()
    val t = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_events") { name kind possibleTypes { name kind } } }""",
      unions = unions)).get("data").get("__type")
    assert(t.get("name").asText === "gql_events")
    assert(t.get("kind").asText === "UNION")
    val pts = t.get("possibleTypes")
    assert(pts.size === 2)
    assert(pts.get(0).get("name").asText === "gql_transfers")
    assert(pts.get(0).get("kind").asText === "OBJECT")
    // concrete object types answer possibleTypes with null, per the meta-schema
    val o = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_transfers") { name kind possibleTypes { name } } }""",
      unions = unions)).get("data").get("__type")
    assert(o.get("kind").asText === "OBJECT")
    assert(o.get("possibleTypes").isNull)
  }

  test("r10 introspection: canonical introspection query, per-field args, enumValues") {
    registerFixture()
    // the graphql-js getIntrospectionQuery shape (the query every
    // generated client actually sends) must execute without errors
    val canonical = """
      query IntrospectionQuery {
        __schema {
          queryType { name }
          mutationType { name }
          subscriptionType { name }
          types {
            kind name description
            fields(includeDeprecated: true) {
              name description
              args { name description type { kind name ofType { kind name ofType { kind name } } } defaultValue }
              type { kind name ofType { kind name ofType { kind name ofType { kind name } } } }
              isDeprecated deprecationReason
            }
            inputFields { name description type { kind name ofType { kind name } } defaultValue }
            interfaces { kind name }
            enumValues(includeDeprecated: true) { name description isDeprecated deprecationReason }
            possibleTypes { kind name }
          }
          directives { name description locations args { name description type { kind name ofType { kind name } } defaultValue } }
        }
      }"""
    val resp = mapper.readTree(GraphQL.execute(spark, canonical))
    assert(!resp.has("errors"), resp.toString.take(600))
    val schema = resp.get("data").get("__schema")
    assert(schema.get("mutationType").isNull && schema.get("subscriptionType").isNull)
    val types = schema.get("types")
    val byName = (0 until types.size).map(i => types.get(i))
      .map(t => t.get("name").asText -> t).toMap
    // Query root field carries the executor's full arg surface
    val q = byName("Query")
    assert(q.get("kind").asText === "OBJECT")
    val qf = (0 until q.get("fields").size).map(q.get("fields").get)
      .find(_.get("name").asText == "gql_logs").get
    val args = (0 until qf.get("args").size).map(qf.get("args").get)
    assert(args.map(_.get("name").asText) ===
      Seq("condition", "first", "offset", "orderBy", "desc", "after"))
    val argT = args.map(a => a.get("name").asText -> a.get("type")).toMap
    assert(argT("condition").get("name").asText === "gql_logsCondition")
    assert(argT("condition").get("kind").asText === "INPUT_OBJECT")
    assert(argT("orderBy").get("name").asText === "gql_logsOrderBy")
    assert(argT("orderBy").get("kind").asText === "ENUM")
    assert(args.find(_.get("name").asText == "first").get
      .get("defaultValue").asText === "100")
    // the root field's type walks to the Connection shell
    assert(qf.get("type").get("kind").asText === "NON_NULL")
    assert(qf.get("type").get("ofType").get("name").asText === "gql_logsConnection")
    val conn = byName("gql_logsConnection")
    val cf = (0 until conn.get("fields").size).map(conn.get("fields").get)
      .map(f => f.get("name").asText -> f.get("type")).toMap
    assert(cf.keySet === Set("nodes", "edges", "totalCount", "pageInfo"))
    // nodes: [gql_logs!]! — NON_NULL(LIST(NON_NULL(gql_logs)))
    val nt = cf("nodes")
    assert(nt.get("kind").asText === "NON_NULL")
    assert(nt.get("ofType").get("kind").asText === "LIST")
    assert(nt.get("ofType").get("ofType").get("ofType").get("name").asText === "gql_logs")
    // OrderBy ENUM lists <COL>_ASC/<COL>_DESC per column
    val ob = byName("gql_logsOrderBy")
    assert(ob.get("kind").asText === "ENUM")
    val evs = (0 until ob.get("enumValues").size)
      .map(i => ob.get("enumValues").get(i).get("name").asText)
    assert(evs.contains("BLOCK_NUMBER_ASC") && evs.contains("BLOCK_NUMBER_DESC"))
    assert(evs.length === 10) // 5 columns × 2 directions
    assert(byName("PageInfo").get("fields").size === 4)
    // column fields carry EMPTY args (they take none), not an error
    assert(byName("gql_logs").get("fields").get(0).get("args").size === 0)
    // directive args carry the real Boolean! type
    val dir = schema.get("directives").get(0)
    assert(dir.get("args").get(0).get("type").get("kind").asText === "NON_NULL")
    assert(dir.get("args").get(0).get("type").get("ofType").get("name").asText === "Boolean")
  }

  test("r10 introspection: derived relation fields carry args; __type(Query) renders") {
    registerFixture()
    Seq(("0xaaa", 9L, 1.5), ("0xaaa", 11L, 2.0))
      .toDF("address", "pblock", "price_usd")
      .createOrReplaceTempView("gql_price")
    val rels = GraphQL.deriveRelations(spark, Seq(("gql_price", "address")))
    val t = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_logs") { fields { name
        |    args { name type { name kind } }
        |    type { kind name ofType { kind name ofType { kind name } } } } } }""".stripMargin,
      relations = rels)).get("data").get("__type")
    val fs = (0 until t.get("fields").size).map(t.get("fields").get)
    val rel = fs.find(_.get("name").asText == "gql_prices").get
    // relation field type: [gql_price!] — LIST(NON_NULL(gql_price))
    assert(rel.get("type").get("kind").asText === "LIST")
    assert(rel.get("type").get("ofType").get("kind").asText === "NON_NULL")
    assert(rel.get("type").get("ofType").get("ofType").get("name").asText === "gql_price")
    val rargs = (0 until rel.get("args").size).map(rel.get("args").get)
    assert(rargs.map(_.get("name").asText) === Seq("condition", "first", "orderBy", "desc"))
    assert(rargs.head.get("type").get("name").asText === "gql_priceCondition")
    // __type(name: "Query") answers the same surface as __schema.queryType
    val qt = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "Query") { name kind fields { name args { name defaultValue } } } }""",
      relations = rels)).get("data").get("__type")
    assert(qt.get("kind").asText === "OBJECT")
    val qnames = (0 until qt.get("fields").size).map(i => qt.get("fields").get(i).get("name").asText)
    assert(qnames.contains("gql_logs") && qnames.contains("gql_price"))
  }

  test("r10 orderBy enum tokens: literal and variable forms execute, conflicts error") {
    registerFixture()
    // bare enum literal carries its own direction
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_logs(orderBy: BLOCK_NUMBER_DESC, first: 1) { block_number } }"""))
    assert(!resp.has("errors"), resp.toString)
    assert(resp.get("data").get("gql_logs").get("nodes").get(0)
      .get("block_number").asLong === 13L)
    // a generated client sends the enum through variables as a string
    val viaVar = mapper.readTree(GraphQL.execute(spark,
      """query Q($ob: gql_logsOrderBy) { gql_logs(orderBy: $ob, first: 1) { block_number } }""",
      variables = Map("ob" -> "BLOCK_NUMBER_DESC")))
    assert(!viaVar.has("errors"), viaVar.toString)
    assert(viaVar.get("data").get("gql_logs").get("nodes").get(0)
      .get("block_number").asLong === 13L)
    def errOf(q: String): String =
      mapper.readTree(GraphQL.execute(spark, q))
        .get("errors").get(0).get("message").asText
    // token + desc: is ambiguous
    assert(errOf("""{ gql_logs(orderBy: BLOCK_NUMBER_DESC, desc: false) { block_number } }""")
      .contains("ambiguous"))
    // unknown token column fails the existing column check
    assert(errOf("""{ gql_logs(orderBy: NOPE_ASC) { block_number } }""").nonEmpty)
    // a non-token bare identifier is not an OrderBy value
    assert(errOf("""{ gql_logs(orderBy: whatever) { block_number } }""")
      .contains("not an OrderBy value"))
    // enum literals outside orderBy are rejected, not smuggled into SQL
    assert(errOf("""{ gql_logs(condition: {address: FOO_ASC}) { block_number } }""")
      .contains("not valid here"))
  }

  test("r10 unions: member type disagreement on orderBy/condition errors; companions derive") {
    val unions = registerUnionFixture()
    // same-named column, different member types: bigint vs string
    Seq((1L, 5L)).toDF("id", "k").createOrReplaceTempView("gql_m1")
    Seq(("a", "x")).toDF("id", "k").createOrReplaceTempView("gql_m2")
    val u2: GraphQL.Unions = Map("gql_mixed" -> Seq("gql_m1", "gql_m2"))
    def errOf(q: String): String =
      mapper.readTree(GraphQL.execute(spark, q, unions = u2))
        .get("errors").get(0).get("message").asText
    assert(errOf("""{ gql_mixed(orderBy: "k") { nodes { __typename } } }""")
      .contains("disagree on the type"))
    assert(errOf("""{ gql_mixed(condition: {k: 5}) { nodes { __typename } } }""")
      .contains("disagree on the type"))
    // a column whose types AGREE still orders (id disagrees, k does; use gql_events)
    val ok = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events(orderBy: BLOCK_NUMBER_DESC, first: 1) { nodes { __typename } } }""",
      unions = unions))
    assert(!ok.has("errors"), ok.toString)
    assert(ok.get("data").get("gql_events").get("nodes").get(0)
      .get("__typename").asText === "gql_approvals") // block 13
    // union companions derive from the (name, type) member intersection
    val cond = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_eventsCondition") { kind inputFields { name } } }""",
      unions = unions)).get("data").get("__type")
    assert(cond.get("kind").asText === "INPUT_OBJECT")
    val cnames = (0 until cond.get("inputFields").size)
      .map(i => cond.get("inputFields").get(i).get("name").asText)
    assert(cnames === Seq("address", "block_number")) // amount/spender are member-only
    val oe = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "gql_eventsOrderBy") { kind enumValues { name } } }""",
      unions = unions)).get("data").get("__type")
    assert(oe.get("kind").asText === "ENUM")
    assert((0 until oe.get("enumValues").size)
      .map(i => oe.get("enumValues").get(i).get("name").asText) ===
      Seq("ADDRESS_ASC", "ADDRESS_DESC", "BLOCK_NUMBER_ASC", "BLOCK_NUMBER_DESC"))
  }

  test("r10 unions/interfaces: relations inside member fragments; bare relations stay loud") {
    val unions = registerUnionFixture()
    Seq(("0xaaa", 9L, 1.5), ("0xaaa", 11L, 2.0), ("0xbbb", 12L, 3.0))
      .toDF("address", "pblock", "price_usd")
      .createOrReplaceTempView("gql_price")
    val rels = GraphQL.deriveRelations(spark, Seq(("gql_price", "address")))
    // relation under a union member fragment: only transfer rows carry
    // the field, child rows match the concrete-type query's
    val resp = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events(orderBy: "block_number") { nodes { __typename
        |    ... on gql_transfers { address
        |      gql_prices(orderBy: "pblock") { pblock price_usd } } } } }""".stripMargin,
      unions = unions, relations = rels))
    assert(!resp.has("errors"), resp.toString)
    val nodes = resp.get("data").get("gql_events").get("nodes")
    // row 0: transfers 0xaaa@10 → its two price rows in pblock order
    assert(nodes.get(0).get("__typename").asText === "gql_transfers")
    val p0 = nodes.get(0).get("gql_prices")
    assert(p0.size === 2)
    assert(p0.get(0).get("pblock").asLong === 9L)
    assert(p0.get(1).get("price_usd").asDouble === 2.0)
    // row 1: approvals — fragment doesn't apply, field absent
    assert(nodes.get(1).get("__typename").asText === "gql_approvals")
    assert(!nodes.get(1).has("gql_prices"))
    // row 2: transfers 0xbbb@12 → its one price row
    assert(nodes.get(2).get("gql_prices").size === 1)
    assert(nodes.get(2).get("gql_prices").get(0).get("price_usd").asDouble === 3.0)
    // matches the concrete-type query's child rows exactly
    val concrete = mapper.readTree(GraphQL.execute(spark,
      """{ gql_transfers(condition: {address: "0xaaa"})
        |  { address gql_prices(orderBy: "pblock") { pblock price_usd } } }""".stripMargin,
      relations = rels))
    assert(concrete.get("data").get("gql_transfers").get("nodes").get(0)
      .get("gql_prices") === p0)
    // relation args apply inside the fragment (first + desc)
    val capped = mapper.readTree(GraphQL.execute(spark,
      """{ gql_events { nodes {
        |    ... on gql_transfers {
        |      gql_prices(first: 1, orderBy: "pblock", desc: true) { pblock } } } } }""".stripMargin,
      unions = unions, relations = rels))
    assert(!capped.has("errors"), capped.toString)
    val cn = capped.get("data").get("gql_events").get("nodes")
    val withPrices = (0 until cn.size).map(cn.get).filter(_.has("gql_prices"))
    assert(withPrices.exists(n =>
      n.get("gql_prices").size === 1 && n.get("gql_prices").get(0).get("pblock").asLong === 11L))
    // interfaces: same machinery through the interface path
    val interfaces: GraphQL.Interfaces = Map("gql_feed" -> Seq("gql_transfers", "gql_approvals"))
    val viaIface = mapper.readTree(GraphQL.execute(spark,
      """{ gql_feed(orderBy: "block_number") { nodes { __typename block_number
        |    ... on gql_transfers { gql_prices(first: 1) { pblock } } } } }""".stripMargin,
      interfaces = interfaces, relations = rels))
    assert(!viaIface.has("errors"), viaIface.toString)
    assert(viaIface.get("data").get("gql_feed").get("nodes").get(0)
      .get("gql_prices").size === 1)
    // the genuinely ambiguous case: a BARE relation on the interface
    val err = mapper.readTree(GraphQL.execute(spark,
      """{ gql_feed { nodes { gql_prices { pblock } } } }""",
      interfaces = interfaces, relations = rels))
      .get("errors").get(0).get("message").asText
    assert(err.contains("ambiguous across members"))
    assert(err.contains("... on <member>"))
  }

  test("r16: a relation drives through an interface member OVER HTTP") {
    val unions = registerUnionFixture() // registers the two member views
    Seq(("0xaaa", 9L, 1.5), ("0xaaa", 11L, 2.0), ("0xbbb", 12L, 3.0))
      .toDF("address", "pblock", "price_usd")
      .createOrReplaceTempView("gql_price")
    val rels = GraphQL.deriveRelations(spark, Seq(("gql_price", "address")))
    val interfaces: GraphQL.Interfaces =
      Map("gql_feed" -> unions("gql_events"))
    val server = GraphQL.serve(spark, 0, relations = rels,
      interfaces = interfaces)
    try {
      val port = server.getAddress.getPort
      val http = java.net.http.HttpClient.newHttpClient()
      def post(q: String) = mapper.readTree(http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/graphql"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(q)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body())
      val resp = post(
        """{ gql_feed(orderBy: "block_number") { nodes { __typename block_number
          |    ... on gql_transfers { address
          |      gql_prices(orderBy: "pblock") { pblock price_usd } } } } }""".stripMargin)
      assert(!resp.has("errors"), resp.toString)
      val nodes = resp.get("data").get("gql_feed").get("nodes")
      assert(nodes.get(0).get("__typename").asText === "gql_transfers")
      val p0 = nodes.get(0).get("gql_prices")
      assert(p0.size === 2 && p0.get(0).get("pblock").asLong === 9L)
      // bare interface field renders for every member row
      assert(nodes.get(1).get("__typename").asText === "gql_approvals")
      assert(nodes.get(1).get("block_number").asLong === 11L)
      assert(!nodes.get(1).has("gql_prices"))
    } finally server.stop(0)
  }

  test("r16: the meta-schema introspects — __Type resolves, meta types list, includeDeprecated args") {
    registerFixture()
    val t = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "__Type") { name kind
        |    fields { name args { name defaultValue
        |      type { kind name } } type { kind name ofType { kind name } } } } }""".stripMargin))
      .get("data").get("__type")
    assert(t.get("name").asText === "__Type")
    assert(t.get("kind").asText === "OBJECT")
    val fields = (0 until t.get("fields").size).map(t.get("fields").get)
      .map(f => f.get("name").asText -> f).toMap
    assert(fields.keySet === Set("kind", "name", "description",
      "specifiedByURL", "fields", "interfaces", "possibleTypes",
      "enumValues", "inputFields", "ofType"))
    // fields(includeDeprecated: Boolean = false) — the per-field arg
    // of the META-schema itself
    val fArgs = fields("fields").get("args")
    assert(fArgs.size === 1)
    assert(fArgs.get(0).get("name").asText === "includeDeprecated")
    assert(fArgs.get(0).get("defaultValue").asText === "false")
    assert(fArgs.get(0).get("type").get("name").asText === "Boolean")
    assert(fields("enumValues").get("args").size === 1)
    // kind: __TypeKind! — a NON_NULL wrapper over the meta enum
    assert(fields("kind").get("type").get("kind").asText === "NON_NULL")
    assert(fields("kind").get("type").get("ofType").get("name").asText === "__TypeKind")
    // the meta types are part of __schema { types }
    val names = {
      val resp = mapper.readTree(GraphQL.execute(spark,
        "{ __schema { types { name } } }"))
      val arr = resp.get("data").get("__schema").get("types")
      (0 until arr.size).map(i => arr.get(i).get("name").asText).toSet
    }
    for (m <- Seq("__Schema", "__Type", "__Field", "__InputValue",
        "__EnumValue", "__Directive", "__TypeKind", "__DirectiveLocation"))
      assert(names.contains(m), s"missing meta type $m")
    // __TypeKind enumerates the spec's eight kinds
    val tk = mapper.readTree(GraphQL.execute(spark,
      """{ __type(name: "__TypeKind") { kind enumValues { name } } }"""))
      .get("data").get("__type")
    assert(tk.get("kind").asText === "ENUM")
    assert((0 until tk.get("enumValues").size)
      .map(i => tk.get("enumValues").get(i).get("name").asText).toSet ===
      Set("SCALAR", "OBJECT", "INTERFACE", "UNION", "ENUM",
        "INPUT_OBJECT", "LIST", "NON_NULL"))
  }
}
