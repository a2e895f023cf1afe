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
}
