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
      assert(conn.get("totalCount").asInt === 2)
      // ids 1,4,7,… have address 0x…1; first two by block: 1 and 4
      assert(conn.get("nodes").get(0).get("evt_block_number").asLong === 1L)
      assert(conn.get("nodes").get(0).get("amount").asText === "31")
      assert(conn.get("nodes").get(1).get("amount").asText === "124")
    } finally server.stop(0)
  }
}
