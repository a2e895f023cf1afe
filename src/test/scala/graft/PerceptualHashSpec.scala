package graft

import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.{MediaFile, MiniEncoder}
import org.apache.spark.sql.functions._

/** Image dHash + banded hamming near-dup: known-bit fixtures (a
  * monotone gradient is all-ones, its reverse all-zeros), the
  * cross-format property that makes perceptual dedup useful (same
  * pixels as PNG and as BMP → identical hash → distance-0 pair),
  * corrupt handling, and the pigeonhole kernel's distance bound. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def ds(files: (Long, Array[Byte])*) =
    files.map { case (id, b) => MediaFile(id, "image", b) }
      .toDS()

  test("dHash of known gradients: monotone rows are all-one bits, reversed all-zero") {
    // 9×8 = exactly thumbnail-sized, so sampling is the identity
    val inc = MiniEncoder.pngGray(9, 8, (x, _) => x * 20) // strictly increasing rows
    val dec = MiniEncoder.pngGray(9, 8, (x, _) => 200 - x * 20) // strictly decreasing
    val flat = MiniEncoder.pngGray(9, 8, (_, _) => 7) // no increase anywhere
    val out = Multimodal.perceptualHash(ds(1L -> inc, 2L -> dec, 3L -> flat))
      .collect().map(p => p.doc_id -> p).toMap
    assert(out(1L).dhash_hex === "ffffffffffffffff")
    assert(out(2L).dhash_hex === "0000000000000000")
    assert(out(3L).dhash_hex === "0000000000000000")
    assert(out(1L).dhash === -1L) // all 64 bits set, two's complement
    assert(out(1L).w === 9 && out(1L).h === 8 && out(1L).fmt === "png")
  }

  test("same pixels as PNG and BMP hash identically; corrupt payloads are invalid") {
    def v(x: Int, y: Int): Int = (x * 13 + y * 31) % 256
    val png = MiniEncoder.pngGray(18, 16, v)
    val bmp = MiniEncoder.bmp24(18, 16, v)
    val out = Multimodal.perceptualHash(
        ds(1L -> png, 2L -> bmp, 3L -> png.take(6)))
      .collect().map(p => p.doc_id -> p).toMap
    assert(out(1L).valid && out(2L).valid)
    assert(out(1L).dhash === out(2L).dhash, "cross-format hash mismatch")
    assert(out(1L).fmt === "png" && out(2L).fmt === "bmp")
    assert(!out(3L).valid)
  }

  test("imageNearDuplicates: cross-format exact dup at distance 0, small edit within bound, unrelated image not paired") {
    // 37-step rows wrap once per row (37·8 > 256), so each row byte
    // has exactly one zero bit — distance 8 from the monotone
    // all-ones image, and no shared band with it either
    def v(x: Int, y: Int): Int = (x * 37 + y * 11) % 256
    // one flipped thumbnail cell: sampling is identity at 9×8, so
    // bumping one pixel flips at most 2 comparison bits
    def vEdit(x: Int, y: Int): Int =
      if (x == 4 && y == 3) (v(x, y) + 120) % 256 else v(x, y)
    val media = ds(
      1L -> MiniEncoder.pngGray(9, 8, v),
      2L -> MiniEncoder.bmp24(9, 8, v),
      3L -> MiniEncoder.pngGray(9, 8, vEdit),
      4L -> MiniEncoder.pngGray(9, 8, (x, _) => x * 25)) // unrelated monotone
    val pairs = Multimodal.imageNearDuplicates(media, maxDistance = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2 && pairs((1L, 3L)) >= 1)
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("hammingCandidates pigeonhole: every pair within maxDistance surfaces when buckets are uncapped") {
    // hand-built 64-bit signatures: baseline, 3 bits flipped, 20 bits flipped
    val base = 0x0f0f0f0f0f0f0f0fL
    val near = base ^ 0x0000000000010101L // distance 3
    val far = base ^ 0x00fffff000000000L // distance 20
    val sigs = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "sh")
    val got = Dedup.hammingCandidates(sigs, width = 64, maxDistance = 3,
        bands = 4, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === Map((1L, 2L) -> 3))
  }
}
