package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Brotli

/** Conformance gate for the pure-JVM RFC 7932 decoder (r18). The
  * corpus under `src/test/resources/brotli_conformance/` was produced
  * by the reference encoder (brotli 1.2.0) from the `.bin` originals:
  * 10 inputs (empty / 1-byte / dictionary-heavy / 50 KB prose / HTML
  * with attribute transforms / multibyte UTF-8 / binary / repetitive
  * / incompressible random / JSON) x qualities 0,1,2,5,9,11 plus
  * lgwin 10/18/24 variants = 90 streams. Quality 11 exercises static
  * dictionary references with transforms, context modes, block
  * switching and context maps; quality 0/1 exercises the fast-path
  * meta-block shapes; the random input forces uncompressed
  * meta-blocks. A decoder table error (huffman, context, transform,
  * ring buffer) fails here byte-for-byte. */
class BrotliSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli_conformance/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  private val inputs = Seq("empty", "one", "dictwords", "prose", "html",
    "multi", "binary", "repeat", "random", "json")

  test("dictionary resource is the published RFC 7932 dictionary (SHA-256 pinned)") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(Brotli.Dictionary).map("%02x".format(_)).mkString
    assert(hex === "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70")
  }

  for (name <- inputs) {
    test(s"round-trip vs the reference encoder: $name (all qualities + windows)") {
      val original = res(s"$name.bin")
      val variants = Seq("q0", "q1", "q2", "q5", "q9", "q11",
        "q5w10", "q5w18", "q5w24")
      for (v <- variants) {
        val br = res(s"$name.$v.br")
        val got = Brotli.decompress(br)
        assert(got.length === original.length, s"$name.$v length")
        assert(java.util.Arrays.equals(got, original), s"$name.$v bytes")
      }
    }
  }

  test("malformed input refuses loudly, never returns wrong bytes") {
    import java.util.zip.DataFormatException
    val good = res("prose.q5.br")
    // truncation at several depths
    for (cut <- Seq(1, good.length / 2, good.length - 1))
      intercept[DataFormatException](Brotli.decompress(good.take(cut)))
    // trailing garbage after a complete stream
    intercept[DataFormatException](Brotli.decompress(good ++ Array[Byte](1, 2, 3)))
    // random garbage
    val rnd = new scala.util.Random(7)
    var refused = 0
    for (_ <- 1 to 50) {
      val junk = Array.fill(64)(rnd.nextInt().toByte)
      try { Brotli.decompress(junk); () }
      catch { case _: DataFormatException => refused += 1 }
    }
    assert(refused >= 45, s"only $refused/50 junk streams refused")
  }

  test("output cap throws instead of inflating a bomb") {
    val big = res("repeat.q11.br") // ~96 KB output
    intercept[java.util.zip.DataFormatException](
      Brotli.decompress(big, maxOut = 1024))
  }

  test("metadata meta-blocks are skipped (hand-crafted, foreign-validated stream)") {
    // the reference encoder never emits a metadata block, so the
    // conformance corpus can't cover this path; this stream was
    // crafted by hand (wbits16 | metadata block skipping 46 junk
    // bytes | uncompressed payload block | empty last block) and
    // libbrotlidec decodes it to the same payload
    val hex = "ac13deadbeef206a756e6b20746865206465636f646572206d75737420736b6970" +
      "20656e746972656c796001086d6574616461746120626c6f636b732061726520736b69" +
      "707065642c207061796c6f616420737572766976657303"
    val br = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(Brotli.decompress(br), "UTF-8") ===
      "metadata blocks are skipped, payload survives")
    // reserved metadata bit set -> refuse
    val reserved = br.clone(); reserved(0) = (reserved(0) | 0x10).toByte
    intercept[java.util.zip.DataFormatException](Brotli.decompress(reserved))
    // metadata block marked ISLAST -> refuse
    val asLast = br.clone(); asLast(0) = (asLast(0) | 0x02).toByte
    intercept[java.util.zip.DataFormatException](Brotli.decompress(asLast))
  }

  test("bit-flip fuzz: every mutant either decodes or throws DataFormatException — nothing else escapes") {
    // a component that reads 100 TB of untrusted crawl bytes must
    // fail only through its contract (HttpBody maps that to a
    // counted null); an AIOOBE/NegativeArraySize/hang would kill the
    // task instead. Deterministic seed; 4000 mutants run in <1 s
    // (a 20k-mutant exploratory run was also clean).
    val seeds = Seq("dictwords.q11.br", "prose.q5.br", "html.q11.br",
      "repeat.q2.br", "multi.q9.br", "one.q0.br").map(res)
    val rnd = new java.util.Random(20260817L)
    for (_ <- 1 to 4000) {
      val b = seeds(rnd.nextInt(seeds.length)).clone()
      for (_ <- 1 to 1 + rnd.nextInt(8)) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { Brotli.decompress(b, maxOut = 4 << 20); () }
      catch { case _: java.util.zip.DataFormatException => () }
    }
  }

  test("compressStored emits valid RFC 7932 streams (foreign-validated; round-trips here)") {
    // libbrotlidec accepted these framings byte-exactly during
    // development (empty / 1 byte / text / 70 KB multi-nibble); the
    // spec pins the self round-trip through the real decode path
    val cases = Seq[Array[Byte]](Array.empty, "x".getBytes,
      "hello brotli stored body with some text".getBytes,
      Array.tabulate(70000)(i => (i % 251).toByte))
    for (d <- cases) {
      val br = Brotli.compressStored(d)
      assert(java.util.Arrays.equals(Brotli.decompress(br), d))
    }
  }

  test("http_body_decode 'br' arm: real streams decode, corrupt bytes null (never throw)") {
    import graft.functions.HttpBodyRuntime
    import org.apache.spark.unsafe.types.UTF8String
    val enc = UTF8String.fromString("br")
    val orig = res("html.bin")
    assert(java.util.Arrays.equals(
      HttpBodyRuntime.decodeOrNull(res("html.q11.br"), enc), orig))
    assert(HttpBodyRuntime.decodeOrNull(Array[Byte](0x6b, 0x00, -1), enc) == null)
    assert(HttpBodyRuntime.decodeOrNull(res("html.q11.br").take(20), enc) == null)
  }
}
