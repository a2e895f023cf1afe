package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFile, MiniEncoder}

/** Per-frame video dHash + timeline-aligned near-dup: known-bit
  * frames, exact-copy pairing over every frame, a one-frame edit
  * dropping exactly one match, stride sampling, and non-pairing of
  * unrelated videos. */
class VideoPhashSpec extends SparkSpec {
  import spark.implicits._

  private def ds(files: (Long, Array[Byte])*) =
    files.map { case (id, b) => MediaFile(id, "video", b) }.toDS()

  // 9×8 frames (thumbnail identity); wrap-once rows like the image
  // spec, shifted per frame so frames have distinct hashes
  private def v(x: Int, y: Int, f: Int): Int = (x * 37 + y * 11 + f * 53) % 256

  test("frame hashes: monotone frames are all ones; frames index in order") {
    val mono = MiniEncoder.gifAnimGray(9, 8, 3, (x, _, _) => x * 20)
    val out = Multimodal.videoFingerprints(ds(1L -> mono)).collect()
      .sortBy(_.frame_index)
    assert(out.map(_.frame_index).toSeq === Seq(0, 1, 2))
    assert(out.forall(_.dhash_hex == "ffffffffffffffff"))
    assert(out.forall(p => p.w == 9 && p.h == 8))
  }

  test("stride samples every n-th frame") {
    val vid = MiniEncoder.gifAnimGray(9, 8, 6, v)
    val out = Multimodal.videoFingerprints(ds(1L -> vid), stride = 2).collect()
    assert(out.map(_.frame_index).sorted.toSeq === Seq(0, 2, 4))
  }

  test("near-dup: exact copy matches every frame, one edited frame drops one match, unrelated video stays unpaired") {
    def vEdit(x: Int, y: Int, f: Int): Int =
      if (f == 2) (255 - x * 25) else v(x, y, f) // frame 2 replaced wholesale
    val a = MiniEncoder.gifAnimGray(9, 8, 4, v)
    val b = MiniEncoder.gifAnimGray(9, 8, 4, v) // byte-identical content
    val c = MiniEncoder.gifAnimGray(9, 8, 4, vEdit)
    val d = MiniEncoder.gifAnimGray(9, 8, 4, (x, _, _) => x * 20) // unrelated monotone
    val pairs = Multimodal.videoNearDuplicates(
        ds(1L -> a, 2L -> b, 3L -> c, 4L -> d), maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 4L)
    assert(pairs((1L, 3L)) === 3L && pairs((2L, 3L)) === 3L)
    assert(!pairs.keySet.exists { case (x, y) => x == 4L || y == 4L })
  }

  test("corrupt payloads yield no frame rows") {
    val vid = MiniEncoder.gifAnimGray(9, 8, 4, v)
    assert(Multimodal.videoFingerprints(ds(1L -> vid.take(6))).count() === 0L)
  }
}
