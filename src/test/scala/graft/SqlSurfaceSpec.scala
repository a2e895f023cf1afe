package graft

import graft.functions.Abi
import graft.sources.Logs
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's SQL surface on Spark: registered decode functions
  * + the exact-uint256 custom expression. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  val MaxUint256 = (BigInt(1) << 256) - 1

  private def word(v: BigInt): String =
    "0x" + v.toString(16).reverse.padTo(64, '0').reverse

  test("toUint256Exact: full 32-byte range, beyond decimal(38)") {
    val big = BigInt("115792089237316195423570985008687907852837564279074904382605163141518161494337") // close to max
    val vals = Seq(BigInt(0), BigInt(1), BigInt(10).pow(38), (BigInt(1) << 128) - 1, big, MaxUint256)
    val got = vals.map(v => word(v)).toDF("d")
      .select(Abi.toUint256Exact(2, $"d").as("s")).as[String].collect()
    assert(got.toSeq === vals.map(_.toString))
    // composed parity decode overflows to null above decimal(38) range
    val overflowed = Seq(word(MaxUint256)).toDF("d")
      .select(Abi.toUint256(2, $"d").as("v")).collect()(0)
    assert(overflowed.isNullAt(0))
  }

  test("toUint256Exact under codegen and interpreted eval agree") {
    val df = Seq(word(BigInt("98765432109876543210987654321098765432109876543210"))).toDF("d")
    val expected = "98765432109876543210987654321098765432109876543210"
    assert(df.select(Abi.toUint256Exact(2, $"d")).as[String].collect()(0) === expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(Abi.toUint256Exact(2, $"d")).as[String].collect()(0) === expected)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("reference view SQL runs via registered functions") {
    Abi.registerSqlFunctions(spark)
    val p = Files.createTempFile("logs", ".ndjson")
    Files.writeString(p,
      """{"address":"0xcd3b51d98478d53f4515a306be565c6eebef1d58","topics":["0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef","0x0000000000000000000000000000000000000000000000000000000000000000","0x000000000000000000000000f78031c993afb43e79f017938326ff34418ec36e"],"data":"0x000000000000000000000000000000000000000000000000aad50c474db4eb50","blockHash":"0x09f1","blockNumber":"0x364df","transactionHash":"0xf9a7","transactionIndex":"0x6","logIndex":"0x12","removed":false}""")
    Logs.readNdjson(spark, p.toString).createOrReplaceTempView("logs")
    // the Transfer view body from init.sql:221, modulo ::text casts
    val r = spark.sql(
      """select to_address(2, topic1) as `from`,
        |       to_address(2, topic2) as `to`,
        |       to_uint256(2, data) as amount,
        |       to_uint256_exact(2, data) as amount_exact,
        |       address as contract_address
        |from logs
        |where topic0 = '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'""".stripMargin)
      .collect()(0)
    assert(r.getAs[String]("from") === "0x0000000000000000000000000000000000000000")
    assert(r.getAs[String]("to") === "0xf78031c993afb43e79f017938326ff34418ec36e")
    assert(r.getAs[java.math.BigDecimal]("amount").toBigInteger.toString ===
      BigInt("aad50c474db4eb50", 16).toString)
    assert(r.getAs[String]("amount_exact") === BigInt("aad50c474db4eb50", 16).toString)
  }

  test("dynamic decode functions via SQL") {
    Abi.registerSqlFunctions(spark)
    val hex = "68656c6c6f" // "hello"
    val data = "0x" + ("0" * 62 + "20") + ("0" * 63 + "5") + hex + "0" * (64 - hex.length)
    val r = spark.sql(
      s"""select to_string(2, '$data') as s, to_size(2, '$data') as n,
         |       to_bytes(2, '$data') as b""".stripMargin).collect()(0)
    assert(r.getAs[String]("s") === "hello")
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[String]("b") === "0x" + hex)
  }

  test("text-signal functions via SQL equal their Column forms") {
    import graft.functions.Text
    import org.apache.spark.sql.functions._
    Abi.registerSqlFunctions(spark)
    val text = "The cat sat, and bob@example.com saw <b>5</b> dogs at HTTP://X.com:80//a?utm_source=f&z=1"
    val viaSql = spark.sql(
      s"""select quality_score('$text') as q, lang_id('$text') as l,
         |  token_count('$text') as n, doc_fingerprint('$text') as fp,
         |  strip_html('$text') as sh, redact_pii('$text') as rp,
         |  canonical_url('HTTP://X.com:80//a?utm_source=f&z=1') as cu,
         |  deflate_ratio('$text') as dr""".stripMargin).collect()(0)
    val viaCol = Seq(text).toDF("t").select(
      Text.qualityScore(col("t")).as("q"), Text.langId(col("t")).as("l"),
      Text.tokenCount(col("t")).as("n"), Text.fingerprint(col("t")).as("fp"),
      Text.stripHtml(col("t")).as("sh"), Text.redactPii(col("t")).as("rp"),
      Text.canonicalUrl(lit("HTTP://X.com:80//a?utm_source=f&z=1")).as("cu"),
      Text.compressionRatio(col("t")).as("dr")).collect()(0)
    for (i <- 0 until viaSql.length)
      assert(viaSql.get(i) === viaCol.get(i), s"field $i diverges")
    assert(viaSql.getAs[String]("rp").contains("<EMAIL>"))
    assert(viaSql.getAs[String]("cu") === "http://x.com/a?z=1")
  }
}
