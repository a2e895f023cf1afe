package graft

import graft.functions.{Keccak, KeccakRuntime}
import graft.operators.EventViews
import org.apache.spark.sql.functions._

/** Keccak-256 surface: known Ethereum vectors pin the Keccak pad
  * byte (all single-block); the JDK's independent SHA3-256
  * implementation cross-checks the permutation and multi-block
  * absorb (same sponge, domain byte 0x06 — see
  * [[KeccakRuntime.sha3_256]]); and the ten reference view hashes
  * (`init.sql:213-222`) recompute from their canonical signatures,
  * turning the registry constants into derived facts. */
class KeccakSpec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  test("known Keccak-256 vectors (Ethereum convention, pad 0x01)") {
    assert(hex(KeccakRuntime.hash256(Array.emptyByteArray)) ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex(KeccakRuntime.hash256("abc".getBytes("UTF-8"))) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(Keccak.topicOf("Transfer(address,address,uint256)") ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(Keccak.selectorOf("transfer(address,uint256)") === "0xa9059cbb")
    assert(Keccak.selectorOf("balanceOf(address)") === "0x70a08231")
  }

  test("multi-block absorb matches the JDK's SHA3-256 (foreign implementation)") {
    val md = java.security.MessageDigest.getInstance("SHA3-256")
    val rnd = new scala.util.Random(42)
    // lengths straddling the 136-byte rate: 0, 1, rate-1, rate,
    // rate+1, several blocks, and a large odd size
    for (n <- Seq(0, 1, 135, 136, 137, 272, 407, 4096, 100003)) {
      val msg = new Array[Byte](n)
      rnd.nextBytes(msg)
      assert(hex(KeccakRuntime.sha3_256(msg)) === hex(md.digest(msg)),
        s"sha3 mismatch at length $n")
    }
  }

  test("all ten reference view hashes derive from their canonical signatures") {
    EventViews.referenceViews.foreach { e =>
      val sig = EventViews.canonicalSignature(e)
      assert(Keccak.topicOf(sig) === e.sigHash,
        s"${e.viewName}: $sig hashes to ${Keccak.topicOf(sig)}, registry says ${e.sigHash}")
    }
  }

  test("fromSignature reconstructs the reference defs verbatim") {
    EventViews.referenceViews.foreach { e =>
      val rebuilt = EventViews.fromSignature(EventViews.canonicalSignature(e), e.fields)
      assert(rebuilt === e)
    }
  }

  test("column expressions: codegen path, null handling, SQL registration") {
    val df = Seq(
      ("Transfer(address,address,uint256)", false),
      ("Approval(address,address,uint256)", false),
      ("x", true)
    ).toDF("sig", "isNull")
      .select(when(!$"isNull", $"sig").as("sig"))
    val got = df.select(
      Keccak.eventTopic($"sig").as("topic"),
      Keccak.selector($"sig").as("sel"),
      Keccak.keccak256(encode($"sig", "UTF-8")).as("raw")
    ).collect()
    assert(got(0).getString(0) ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(got(0).getString(1) === "0xddf252ad")
    assert("0x" + hex(got(0).getAs[Array[Byte]](2)) === got(0).getString(0))
    assert(got(1).getString(0) ===
      "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925")
    assert(got(2).isNullAt(0) && got(2).isNullAt(1) && got(2).isNullAt(2))

    graft.functions.Abi.registerSqlFunctions(spark)
    val viaSql = spark.sql(
      "select event_topic('Transfer(address,address,uint256)') as t, " +
        "abi_selector('transfer(address,uint256)') as s").collect()(0)
    assert(viaSql.getString(0) ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(viaSql.getString(1) === "0xa9059cbb")
  }
}
