package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFile, MiniEncoder}

/** Audio energy-difference fingerprint: known-bit fixtures
  * (monotone-energy streams), the cross-bit-depth invariance that
  * makes it a dedup key (16-bit and 24-bit encodings of the same
  * signal hash identically → distance-0 pair), small-perturbation
  * locality, and corrupt handling. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def ds(files: (Long, Array[Byte])*) =
    files.map { case (id, b) => MediaFile(id, "audio", b) }.toDS()

  test("known bits: rising energy is all ones, falling all zeros") {
    // mono, 65 frames = one sample per window; |v| strictly rising
    val up = MiniEncoder.wavPcm(8000, 1, 65, (i, _) => i * 500)
    val down = MiniEncoder.wavPcm(8000, 1, 65, (i, _) => (64 - i) * 500)
    val out = Multimodal.audioFingerprint(ds(1L -> up, 2L -> down))
      .collect().map(a => a.doc_id -> a).toMap
    assert(out(1L).ehash_hex === "ffffffffffffffff")
    assert(out(2L).ehash_hex === "0000000000000000")
    assert(out(1L).n_samples === 65L && out(1L).channels === 1)
  }

  test("16-bit and 24-bit encodings of one signal fingerprint identically and pair at distance 0") {
    def v(i: Int, c: Int): Int = ((i * 77 + c * 13) % 64000) - 32000
    val w16 = MiniEncoder.wavPcm(16000, 2, 130, v)
    val w24 = MiniEncoder.wavPcmN(16000, 2, 130, 24, (i, c) => v(i, c) << 8)
    val out = Multimodal.audioFingerprint(ds(1L -> w16, 2L -> w24))
      .collect().map(a => a.doc_id -> a).toMap
    assert(out(1L).valid && out(2L).valid)
    assert(out(1L).ehash === out(2L).ehash, "bit-depth must not change the fingerprint")
    val pairs = Multimodal.audioNearDuplicates(ds(1L -> w16, 2L -> w24))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs === Map((1L, 2L) -> 0))
  }

  test("a small perturbation moves few bits; corrupt payloads are invalid") {
    def v(i: Int, c: Int): Int = ((i * 77 + c * 13) % 64000) - 32000
    // boost one window's energy enough to flip its two comparisons
    def vLoud(i: Int, c: Int): Int = if (i >= 60 && i < 62) 32600 else v(i, c)
    val a = MiniEncoder.wavPcm(16000, 1, 130, v)
    val b = MiniEncoder.wavPcm(16000, 1, 130, vLoud)
    val out = Multimodal.audioFingerprint(ds(1L -> a, 2L -> b, 3L -> a.take(20)))
      .collect().map(x => x.doc_id -> x).toMap
    assert(out(1L).valid && out(2L).valid && !out(3L).valid)
    val dist = java.lang.Long.bitCount(out(1L).ehash ^ out(2L).ehash)
    assert(dist >= 1 && dist <= 4, s"expected a local change, hamming=$dist")
  }
}
