package graft

import graft.serving.{GraphQL, Subscriptions}
import graft.streaming.LogStream
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The pg-pubsub analog: micro-batches fan out to SSE subscribers,
  * decoded through the subscribed view, filtered by condition. */
class SubscriptionsSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val transferSig =
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
  private def transferView = graft.operators.EventViews.referenceViews
    .find(_.viewName.startsWith("Transfer")).get.viewName

  /** A raw-logs batch shaped like a streaming micro-batch: `n` Transfer
    * events round-robined over 3 contract addresses. */
  private def batch(n: Int) = spark.range(1, n + 1L).select(
    format_string("0x%040x", col("id") % 3).as("address"),
    lit(transferSig).as("topic0"),
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

  test("publish decodes through the subscribed view and honors the condition") {
    val hub = new Subscriptions.Hub()
    val sub = hub.subscribe(
      s"""subscription { $transferView(condition: {contract_address: "0x${"0" * 39}1"})
         |  { amount evt_block_number } }""".stripMargin)
    hub.publish(batch(9))
    val ev = sub.next(5000).get
    val conn = mapper.readTree(ev).get("data").get(transferView)
    // ids 1,4,7 have address 0x…1 → three matching decoded rows
    assert(conn.get("nodes").size === 3)
    assert(conn.get("nodes").get(0).get("amount").asText === "31")
    assert(conn.get("truncated").asBoolean === false)
    // a batch with no matching rows emits NO event (quiet stream)
    hub.publish(batch(9).filter(col("address") === "0xnope"))
    assert(sub.next(200).isEmpty)
    hub.unsubscribe(sub.id)
    assert(hub.active === 0)
  }

  test("raw `logs` subscription, per-batch cap, and error surfaces") {
    val hub = new Subscriptions.Hub(maxEventsPerBatch = 5)
    val sub = hub.subscribe("subscription { logs { block_number transaction_hash } }")
    hub.publish(batch(8))
    val conn = mapper.readTree(sub.next(5000).get).get("data").get("logs")
    assert(conn.get("nodes").size === 5) // capped
    assert(conn.get("truncated").asBoolean === true)
    // `first` below the cap narrows it further
    val sub2 = hub.subscribe("subscription { logs(first: 2) { block_number } }")
    hub.publish(batch(8))
    assert(mapper.readTree(sub2.next(5000).get)
      .get("data").get("logs").get("nodes").size === 2)
    // subscribe-time validation: unknown view, multi-field docs
    intercept[GraphQL.ParseError](hub.subscribe("subscription { nosuch { a } }"))
    intercept[GraphQL.ParseError](
      hub.subscribe("{ logs { address } logs { address } }"))
    // bad column surfaces as an error EVENT, stream stays alive
    val sub3 = hub.subscribe("subscription { logs { nosuch_col } }")
    hub.publish(batch(2))
    assert(mapper.readTree(sub3.next(5000).get)
      .get("errors").get(0).get("message").asText.contains("no field"))
  }

  test("subscription aliases re-key the response; alias-only diff gets its own render") {
    val hub = new Subscriptions.Hub()
    // root and column aliases flow through to the event keys
    val sub = hub.subscribe("subscription { l: logs(first: 2) { bn: block_number } }")
    // same predicate, different keys: must NOT share sub's rendered string
    val sub2 = hub.subscribe("subscription { logs(first: 2) { block_number } }")
    hub.publish(batch(3))
    val conn = mapper.readTree(sub.next(5000).get).get("data").get("l")
    assert(conn !== null)
    assert(conn.get("nodes").get(0).has("bn"))
    assert(!conn.get("nodes").get(0).has("block_number"))
    val conn2 = mapper.readTree(sub2.next(5000).get).get("data").get("logs")
    assert(conn2.get("nodes").get(0).has("block_number"))
    hub.unsubscribe(sub.id); hub.unsubscribe(sub2.id)
  }

  test("publish runs ONE render per distinct predicate, not per subscriber") {
    // hubDup: five subscribers over THREE distinct (condition,
    // selections, cap) keys; hubDistinct: one subscriber per key. The
    // Spark job count of a publish must be IDENTICAL — sharers ride
    // the same render (collectLimit may run >1 internal job per
    // render, so compare against the one-per-key baseline instead of
    // asserting an absolute count)
    val sharedDoc =
      """subscription { logs(condition: {address: "0x0000000000000000000000000000000000000001"})
        |  { block_number } }""".stripMargin
    val otherDoc = "subscription { logs { block_number } }"
    val viewDoc = s"subscription { $transferView { amount } }"
    val hubDup = new Subscriptions.Hub()
    val shared = (1 to 3).map(_ => hubDup.subscribe(sharedDoc))
    val other = hubDup.subscribe(otherDoc)
    val viewSub = hubDup.subscribe(viewDoc)
    val hubDistinct = new Subscriptions.Hub()
    Seq(sharedDoc, otherDoc, viewDoc).foreach(hubDistinct.subscribe)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def measure(f: => Unit): Int = {
      jobs.set(0)
      f
      // listener delivery is async — wait for the count to stabilize
      val deadline = System.nanoTime() + 5_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && jobs.get != last) {
        last = jobs.get; Thread.sleep(200)
      }
      jobs.get
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val b = batch(9).cache()
      b.count() // materialize outside the measured window
      val withDuplicates = measure(hubDup.publish(b))
      val baseline = measure(hubDistinct.publish(b))
      assert(withDuplicates === baseline,
        s"5 subscribers over 3 predicates cost $withDuplicates jobs vs $baseline for 3 distinct")
      b.unpersist()
    } finally spark.sparkContext.removeSparkListener(listener)
    // and all three sharers got the SAME event
    val evs = shared.map(_.next(5000).get)
    assert(evs.distinct.size === 1)
    assert(mapper.readTree(evs.head).get("data").get("logs").get("nodes").size === 3)
    assert(other.next(5000).nonEmpty && viewSub.next(5000).nonEmpty)
  }

  test("SSE end-to-end: curl-shaped client sees decoded events arrive") {
    val hub = new Subscriptions.Hub()
    val server = Subscriptions.serve(hub, 0, keepaliveMs = 200)
    try {
      val port = server.getAddress.getPort
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/subscribe"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            s"subscription { $transferView { to amount } }"))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofInputStream())
      assert(resp.statusCode === 200)
      assert(resp.headers().firstValue("Content-Type").get === "text/event-stream")
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(resp.body(), "UTF-8"))
      // first frame is the subscription ack comment
      assert(reader.readLine().startsWith(": subscribed"))
      // wait for the registry to see the subscriber, then publish
      val t0 = System.nanoTime()
      while (hub.active == 0 && System.nanoTime() - t0 < 10e9) Thread.sleep(20)
      assert(hub.active === 1)
      hub.publish(batch(3))
      // skip keepalives until the data event lands
      var line = reader.readLine()
      while (line != null && !line.startsWith("data: ")) line = reader.readLine()
      val conn = mapper.readTree(line.stripPrefix("data: "))
        .get("data").get(transferView)
      assert(conn.get("nodes").size === 3)
      assert(conn.get("nodes").get(0).get("amount").asText === "31")
      // malformed subscription → 400 with a GraphQL error body
      val bad = http.send(
        java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/subscribe"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{ nosuch { a } }"))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode === 400)
      assert(mapper.readTree(bad.body()).get("errors").get(0)
        .get("message").asText.contains("unknown subscribable view"))
      reader.close() // client drops → server unsubscribes
      val t1 = System.nanoTime()
      while (hub.active > 0 && System.nanoTime() - t1 < 10e9) Thread.sleep(50)
      assert(hub.active === 0)
    } finally server.stop(0)
  }

  test("ingest stream fans out to the hub per micro-batch") {
    val dir = Files.createTempDirectory("sub_in")
    val table = Files.createTempDirectory("sub_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("sub_ckpt").toString
    val hub = new Subscriptions.Hub()
    val sub = hub.subscribe("subscription { logs { block_number } }")
    def wireRow(b: Long): String =
      s"""{"address":"0xaaa","topics":["$transferSig"],"data":"0x01",""" +
        s""""blockHash":"0xb$b","blockNumber":"0x${b.toHexString}",""" +
        s""""transactionHash":"0xtx$b","transactionIndex":"0x0",""" +
        s""""logIndex":"0x0","removed":false}"""
    Files.writeString(dir.resolve("w1.ndjson"), Seq(1L, 2L, 3L).map(wireRow).mkString("\n"))
    val q = LogStream.ingest(spark, dir.toString, table, ckpt, onBatch = hub.publish)
    q.awaitTermination(60000)
    // the sink kept the rows AND the hub saw the batch
    assert(graft.sources.Logs.read(spark, table).count() === 3)
    val conn = mapper.readTree(sub.next(5000).get).get("data").get("logs")
    assert(conn.get("nodes").size === 3)
  }
}
