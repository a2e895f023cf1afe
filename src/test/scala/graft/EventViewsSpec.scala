package graft

import graft.operators.EventViews
import graft.sources.Logs
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventViewsSpec extends SparkSpec {

  private val goldenTransfer =
    """{"address":"0xcd3b51d98478d53f4515a306be565c6eebef1d58","topics":["0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef","0x0000000000000000000000000000000000000000000000000000000000000000","0x000000000000000000000000f78031c993afb43e79f017938326ff34418ec36e"],"data":"0x000000000000000000000000000000000000000000000000aad50c474db4eb50","blockHash":"0x09f1","blockNumber":"0x364df","transactionHash":"0xf9a7","transactionIndex":"0x6","logIndex":"0x12","removed":false}"""
  private val otherEvent =
    """{"address":"0xcd3b","topics":["0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925","0x000000000000000000000000f78031c993afb43e79f017938326ff34418ec36e","0x0000000000000000000000000000000000000000000000000000000000000001"],"data":"0x0000000000000000000000000000000000000000000000000000000000000005","blockHash":"0xaa","blockNumber":"0x364e0","transactionHash":"0xbb","transactionIndex":"0x0","logIndex":"0x0","removed":false}"""

  private lazy val logs = {
    val p = Files.createTempFile("logs", ".ndjson")
    Files.writeString(p, goldenTransfer + "\n" + otherEvent)
    Logs.readNdjson(spark, p.toString)
  }

  test("Transfer view decodes the golden row with metadata quad") {
    EventViews.registerAll(spark, logs)
    val t = spark.sql(
      """select * from Transfer_address_from_address_to_uint256_amount_d""")
    assert(t.columns.toSeq === Seq(
      "from", "to", "amount",
      "contract_address", "evt_tx_hash", "evt_index", "evt_block_time", "evt_block_number"))
    val r = t.collect()
    assert(r.length === 1) // topic0 filter excludes the Approval row
    val row = r(0)
    assert(row.getAs[String]("from") === "0x0000000000000000000000000000000000000000")
    assert(row.getAs[String]("to") === "0xf78031c993afb43e79f017938326ff34418ec36e")
    assert(row.getAs[java.math.BigDecimal]("amount").toBigInteger.toString ===
      BigInt("aad50c474db4eb50", 16).toString)
    assert(row.getAs[String]("contract_address") === "0xcd3b51d98478d53f4515a306be565c6eebef1d58")
    assert(row.getAs[Long]("evt_block_number") === 222431L)
    assert(row.getAs[Long]("evt_index") === 18L)
  }

  test("RefCompat mode reproduces the README's documented value") {
    val v = EventViews.project(
      logs,
      EventViews.referenceViews.find(_.viewName.startsWith("Transfer")).get,
      EventViews.RefCompat)
    val amount = v.select("amount").collect()(0).getDecimal(0)
    assert(amount.toBigInteger.toString === "12309758656873032448") // README.md:168
  }

  test("Approval view sees only its signature") {
    EventViews.registerAll(spark, logs)
    val a = spark.sql(
      """select owner, spender, amount from Approval_address_owner_address_spender_uint256_amount_d""")
    val r = a.collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("owner") === "0xf78031c993afb43e79f017938326ff34418ec36e")
    assert(r(0).getAs[java.math.BigDecimal]("amount").intValue === 5)
  }

  test("all 10 reference views register and resolve") {
    EventViews.registerAll(spark, logs)
    EventViews.referenceViews.foreach { e =>
      val df = spark.sql(s"""select * from `${e.viewName}`""")
      assert(df.columns.length === e.fields.length + 5)
    }
  }

  test("topic0 filter reaches the parquet scan (pushdown)") {
    val dir = Files.createTempDirectory("logs_pq").toString + "/t"
    Logs.appendIdempotent(spark, logs, dir)
    val stored = Logs.read(spark, dir)
    val plan = EventViews.project(stored, EventViews.referenceViews.last)
      .queryExecution.executedPlan.toString
    // plan rendering truncates long literals; a prefix is enough to
    // prove the equality reached the scan's PushedFilters
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(topic0,0xfbde797d"))
  }

  test("r10 chain namespaces: permanent views per catalog database, cross-chain union") {
    // the db-create.sql database-per-chain deploy as real Spark
    // catalog databases: external logs table + permanent decode views
    val base = Files.createTempDirectory("graft_chains").toString
    logs.write.mode("overwrite").parquet(s"$base/moon_logs")
    logs.limit(1).write.mode("overwrite").parquet(s"$base/eth_logs")
    EventViews.registerChainNamespace(spark, "graft_moonbeam", s"$base/moon_logs",
      dbLocation = Some(s"$base/db_moon"))
    EventViews.registerChainNamespace(spark, "graft_ethereum", s"$base/eth_logs",
      dbLocation = Some(s"$base/db_eth"))
    val t = "Transfer_address_from_address_to_uint256_amount_d"
    // qualified names resolve; decode matches the temp-view path's
    // golden row (through the registered SQL function surface)
    val r = spark.sql(s"select `to`, amount, evt_block_number from graft_moonbeam.`$t`")
      .collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "0xf78031c993afb43e79f017938326ff34418ec36e")
    assert(r(0).getDecimal(1).toBigInteger.toString ===
      BigInt("aad50c474db4eb50", 16).toString)
    assert(r(0).getLong(2) === 222431L)
    // all 10 views exist in each database (SHOW TABLES also lists the
    // session's temp views — other suites register those, filter them)
    assert(spark.sql("show tables in graft_moonbeam")
      .filter(!col("isTemporary")).count() === 11L) // logs + 10 views
    // the q14 multi-chain union, expressed over QUALIFIED names
    val u = spark.sql(
      s"""select chain, count(*) as n from (
         |  select 'moonbeam' as chain from graft_moonbeam.`$t`
         |  union all
         |  select 'ethereum' as chain from graft_ethereum.`$t`
         |) group by chain order by chain""".stripMargin).collect()
    assert(u.map(x => x.getString(0) -> x.getLong(1)).toMap ===
      Map("moonbeam" -> 1L, "ethereum" -> 1L))
    // permanent, not session-scoped: a FRESH session still answers
    // (builtin-level function registration is what makes this legal)
    val s2 = spark.newSession()
    assert(s2.sql(s"select count(*) from graft_moonbeam.`$t`").head().getLong(0) === 1L)
    // idempotent re-registration
    EventViews.registerChainNamespace(spark, "graft_moonbeam", s"$base/moon_logs",
      dbLocation = Some(s"$base/db_moon"))
    assert(spark.sql(s"select count(*) from graft_moonbeam.`$t`").head().getLong(0) === 1L)
    // injection-shaped chain names are rejected up front
    val err = intercept[IllegalArgumentException](
      EventViews.registerChainNamespace(spark, "x`; drop", s"$base/moon_logs"))
    assert(err.getMessage.contains("identifier"))
  }

  test("re-registration after an overwrite serves the new files (table-relation cache)") {
    // q94's bench shape: write → register → READ (caches the table
    // relation) → overwrite (new part files) → re-register → read.
    // The catalog's relation cache keys on the TABLE name, so only a
    // table-level refresh saves the second read from chasing the
    // deleted part files (the recurring FAILED_READ_FILE warmup
    // failures in q94's bench runs).
    val base = Files.createTempDirectory("graft_chains2").toString
    logs.write.mode("overwrite").parquet(s"$base/ch_logs")
    EventViews.registerChainNamespace(spark, "graft_refresh", s"$base/ch_logs",
      dbLocation = Some(s"$base/db_r"))
    val t = "Transfer_address_from_address_to_uint256_amount_d"
    assert(spark.sql(s"select count(*) from graft_refresh.`$t`").head().getLong(0) === 1L)
    logs.unionByName(logs).write.mode("overwrite").parquet(s"$base/ch_logs")
    EventViews.registerChainNamespace(spark, "graft_refresh", s"$base/ch_logs",
      dbLocation = Some(s"$base/db_r"))
    assert(spark.sql(s"select count(*) from graft_refresh.`$t`").head().getLong(0) === 2L)
  }
}
