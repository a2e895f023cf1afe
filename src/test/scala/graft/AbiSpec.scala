package graft

import graft.functions.Abi
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unit + property tests for the ABI decode library.
  *
  * Golden vector: the reference README's worked Transfer example
  * (`/root/reference/README.md:158-179`): data word
  * `0x…aad50c474db4eb50` must decode to 12309758656873032448; topics
  * decode to the from/to addresses.
  *
  * Property tests are seeded-random batch checks (scalatestplus isn't
  * in the offline cache): one DataFrame of (encoded, expected) pairs
  * per property, decoded in a single Spark job.
  */
class AbiSpec extends SparkSpec {
  import spark.implicits._

  /** Encode a BigInt as one 0x-prefixed 32-byte ABI word (2's-complement). */
  private def word(v: BigInt): String = {
    val m = if (v < 0) (BigInt(1) << 256) + v else v
    "0x" + m.toString(16).reverse.padTo(64, '0').reverse
  }

  private def evalStr(c: Column): String =
    Seq(1).toDF("x").select(c.cast("string").as("r")).collect()(0).getString(0)

  private def decodeOne(data: String, f: (Int, Column) => Column): String =
    evalStr(f(2, lit(data)))

  /** Batch-check: decode(word(v)) == expected for every pair. */
  private def checkAll(pairs: Seq[(String, String)], f: (Int, Column) => Column): Unit = {
    val got = pairs.toDF("data", "expected")
      .select($"expected", f(2, $"data").cast("string").as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  val goldenData = "0x000000000000000000000000000000000000000000000000aad50c474db4eb50"
  val goldenT1   = "0x0000000000000000000000000000000000000000000000000000000000000000"
  val goldenT2   = "0x000000000000000000000000f78031c993afb43e79f017938326ff34418ec36e"

  test("golden Transfer vector (README.md:158-179)") {
    // Reference-exact mode reproduces the README's documented decoded
    // value (the lpad-truncation + bit(n)-right-pad artifact clips the
    // last byte: …4db4eb50 → …4db4eb00 = 12309758656873032448).
    assert(decodeOne(goldenData, Abi.Ref.toUint256) === "12309758656873032448")
    assert(decodeOne(goldenData, Abi.Ref.toUint64) === "12309758656873032448")
    // Native mode decodes the word exactly.
    assert(decodeOne(goldenData, Abi.toUint256) ===
      BigInt("aad50c474db4eb50", 16).toString)
    assert(decodeOne(goldenT1, Abi.toAddress) === "0x0000000000000000000000000000000000000000")
    assert(decodeOne(goldenT2, Abi.toAddress) === "0xf78031c993afb43e79f017938326ff34418ec36e")
  }

  test("multi-word positions (Deposit/Withdraw shape, init.sql:215,222)") {
    val two = "0x" + "0" * 62 + "2a" + "0" * 48 + "aad50c474db4eb50"
    assert(evalStr(Abi.toUint256(2, lit(two))) === "42")
    assert(evalStr(Abi.toUint256(66, lit(two))) ===
      BigInt("aad50c474db4eb50", 16).toString)
    // Reference-exact mode: positions past char 64 are clipped by the
    // lpad truncation and decode to 0 — what the shipped views compute.
    assert(evalStr(Abi.Ref.toUint256(66, lit(two))) === "0")
  }

  test("signed decodes") {
    assert(decodeOne(word(BigInt(-1)), Abi.toInt64) === "-1")
    assert(decodeOne(word(BigInt(-123456789)), Abi.toInt64) === "-123456789")
    assert(decodeOne(word(BigInt(Long.MaxValue)), Abi.toInt64) === Long.MaxValue.toString)
    assert(decodeOne(word(BigInt(Long.MinValue)), Abi.toInt64) === Long.MinValue.toString)
    assert(decodeOne(word(BigInt(-42)), Abi.toInt32) === "-42")
    assert(decodeOne(word(BigInt(Int.MinValue)), Abi.toInt32) === Int.MinValue.toString)
  }

  test("bool / fixed bytes / hex casts") {
    assert(decodeOne(word(1), Abi.toBool) === "true")
    assert(decodeOne(word(0), Abi.toBool) === "false")
    assert(evalStr(Abi.hexToLong(lit("0x364df"))) === "222431")
    assert(evalStr(Abi.longToHex(lit(222431L))) === "0x364df")
    // to_fixed_bytes rtrims '0' chars (reference parity, init.sql:137-142)
    assert(evalStr(Abi.toFixedBytes(2, lit("0x" + "deadbeef" + "0" * 56), 4)) === "0xdeadbeef")
  }

  test("dynamic string decode (ABI-encoded 'hello')") {
    // offset word (0x20) | length word (5) | 'hello' padded
    val hex = "68656c6c6f" // "hello"
    val data = "0x" + ("0" * 62 + "20") + ("0" * 63 + "5") + hex + "0" * (64 - hex.length)
    assert(evalStr(Abi.toString(2, lit(data))) === "hello")
    assert(evalStr(Abi.toBytes(2, lit(data))) === "0x" + hex)
    assert(evalStr(Abi.toSize(2, lit(data))) === "5")
    assert(evalStr(Abi.toLocation(2, lit(data))) === "32")
  }

  test("dynamic array decode, native ArrayType") {
    // uint array [7, 9]: offset 0x20 | len 2 | word(7) | word(9)
    val data = "0x" + ("0" * 62 + "20") + ("0" * 63 + "2") +
      ("0" * 63 + "7") + ("0" * 63 + "9")
    assert(evalStr(Abi.toArray(2, lit(data), "uint64")) === "[7, 9]")
    val empty = "0x" + ("0" * 62 + "20") + ("0" * 64)
    assert(evalStr(Abi.toArray(2, lit(empty), "uint64")) === "[]")
  }

  test("fixed array decode") {
    val data = "0x" + ("0" * 63 + "3") + ("0" * 63 + "4")
    assert(evalStr(Abi.toFixedArray(2, lit(data), "uint32", 2)) === "[3, 4]")
    assert(evalStr(Abi.toFixedArrayCompat(2, lit(data), "uint32", 2)) === "[3,4]")
  }

  test("null/empty data decodes to null, not error") {
    val df = Seq((1, null: String)).toDF("i", "d")
    val r = df.select(Abi.toUint256(2, $"d").as("v")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("property: uint64 round-trip vs BigInt") {
    val rnd = new scala.util.Random(42)
    val vs = Seq.fill(200)(BigInt(64, rnd)) ++ Seq(BigInt(0), (BigInt(1) << 64) - 1)
    checkAll(vs.map(v => word(v) -> v.toString), Abi.toUint64)
  }

  test("property: uint128/uint256 limb arithmetic vs BigInt, < 1e38") {
    val rnd = new scala.util.Random(7)
    val vs = (Seq.fill(300)(BigInt(127, rnd)) ++
      Seq(BigInt(0), BigInt(1) << 96, (BigInt(1) << 126) - 1))
      .filter(_ < BigInt(10).pow(38))
    checkAll(vs.map(v => word(v) -> v.toString), Abi.toUint128)
    checkAll(vs.map(v => word(v) -> v.toString), Abi.toUint256)
  }

  test("property: int64/int32 two's-complement round-trip") {
    val rnd = new scala.util.Random(13)
    val longs = Seq.fill(200)(rnd.nextLong()) ++ Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
    checkAll(longs.map(n => word(BigInt(n)) -> n.toString), Abi.toInt64)
    val ints = Seq.fill(200)(rnd.nextInt()) ++ Seq(0, 1, -1, Int.MaxValue, Int.MinValue)
    checkAll(ints.map(n => word(BigInt(n)) -> n.toString), Abi.toInt32)
  }

  test("property: hexToLong/longToHex round-trip (types.go:27-39)") {
    val rnd = new scala.util.Random(99)
    val vs = Seq.fill(200)(rnd.nextLong().abs.max(0L)) ++ Seq(0L, Long.MaxValue)
    val got = vs.toDF("n")
      .select($"n", Abi.hexToLong(Abi.longToHex($"n")).as("rt"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }
}
