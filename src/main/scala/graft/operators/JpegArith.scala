package graft.operators

/** T.81 Annex D arithmetic (QM) entropy coding for JPEG — the
  * decoder behind [[JpegCodec.decodeImage]]'s SOF9 path and a DC-only
  * arithmetic encoder for the q90 gate.
  *
  * The state machine is ITU-T T.81 Table D.3 (113 adaptive states +
  * the fixed near-equiprobable state 113 used for AC signs); the
  * values here were cross-checked against the system libjpeg's
  * `jpeg_aritab` rendering of the same public table. The coder
  * geometry is the QM coder with the MPS owning the lower
  * subinterval and conditional MPS/LPS exchange when the MPS
  * subinterval shrinks below Qe; compressed bytes are FF00
  * byte-stuffed (0xFF data is followed by a stuffed 0x00, exactly
  * like Huffman entropy segments), and a decoder that runs past the
  * terminating marker feeds zero bits — all three conventions
  * validated BYTE-EXACTLY against libjpeg: the [[Encoder]] reproduces
  * libjpeg's arithmetic output bit for bit on the golden fixtures,
  * and the [[Decoder]] is its mechanical inverse (interval state `a`
  * starts at 0x10000 with the first 16 stream bits as the initial
  * code offset; renormalization doubles both and pulls one bit).
  *
  * Statistics bins (one byte per context: state index in the low 7
  * bits, current MPS sense in bit 7) follow T.81 §F.1.4.4: DC uses a
  * 64-byte area per table — 5 previous-diff conditioning categories
  * × 4 decision bins at 0/4/8/12/16, magnitude categories X1.. at
  * 20, magnitude bits 14 past the terminating category bin; AC uses
  * a 256-byte area — 3 bins per coefficient index k at 3(k−1)
  * (EOB, significance, magnitude>1), shared magnitude-category areas
  * at 189 (k ≤ Kx) and 217 (k > Kx), sign through the fixed bin.
  * Conditioning defaults L=0, U=1, Kx=5 per the standard; the DAC
  * marker overrides per table. */
private[operators] object JpegArith {

  private val Qe: Array[Int] = Array(
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F, 0x0036, 0x001A, 0x000D, 0x0006,
    0x0003, 0x0001, 0x5A7F, 0x3F25, 0x2CF2, 0x207C, 0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C,
    0x0406, 0x0303, 0x0240, 0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A, 0x0068, 0x004E, 0x003B, 0x002C,
    0x5AE1, 0x484C, 0x3A0D, 0x2EF1, 0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177, 0x0E74, 0x0BFB, 0x09F8,
    0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363, 0x02D4, 0x025C, 0x01F8, 0x01A4, 0x0160, 0x0125,
    0x00F6, 0x00CB, 0x00AB, 0x008F, 0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40, 0x5832, 0x4D1C, 0x438E, 0x3BDD,
    0x34EE, 0x2EAE, 0x299A, 0x2516, 0x5570, 0x4CA9, 0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8,
    0x4F46, 0x47E5, 0x41CF, 0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639, 0x415E, 0x5627, 0x50E7, 0x4B85,
    0x5597, 0x504F, 0x5A10, 0x5522, 0x59EB, 0x5A1D
  )
  private val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 9, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57,
    58, 59, 60, 61, 62, 63, 32, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76,
    77, 78, 79, 48, 81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86,
    96, 97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107, 111, 109, 111, 113
  )
  private val Nlps: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36, 38, 39, 40,
    42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60, 62, 63, 32, 33, 37, 64,
    65, 67, 68, 69, 70, 72, 73, 74, 75, 77, 78, 79, 48, 50, 50, 51, 52, 53, 54,
    55, 56, 57, 58, 59, 61, 61, 65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74,
    74, 75, 77, 77, 80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93,
    95, 101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111, 110, 112, 112, 113
  )
  private val Sw: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 1, 0
  )

  /** The fixed near-equiprobable bin (state 113 self-loops, never
    * switches) used for AC coefficient signs. */
  def newFixedBin(): Array[Byte] = Array(113.toByte)

  /** QM decoder over one entropy segment starting at `start`.
    * `pos` advances as bytes are consumed; it never moves past the
    * terminating marker's 0xFF, so callers can scan forward from it
    * for RSTn markers. */
  final class Decoder(b: Array[Byte], start: Int) {
    var pos: Int = start
    private var marker = false
    private var endOfData = false
    private var cur = 0
    private var nbits = 0
    private var a = 0x10000
    private var off = 0
    locally {
      var k = 0
      while (k < 16) { off = (off << 1) | bit(); k += 1 }
    }

    /** True when the decoder ran off the END of the buffer without a
      * terminating marker — zero bits past a REAL marker are the
      * legitimate Annex D tail, the same bits past a truncation are
      * a mis-decode; callers refuse on this. */
    def hitEnd: Boolean = endOfData

    private def nextByte(): Int = {
      if (pos >= b.length) { marker = true; endOfData = true; 0 }
      else if (marker) 0
      else {
        val d = b(pos) & 0xff
        if (d != 0xff) { pos += 1; d }
        else {
          var j = pos + 1
          while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
          val nxt = if (j < b.length) b(j) & 0xff else -1
          if (nxt == 0) { pos = j + 1; 0xff } // FF00 → data byte FF
          else { marker = true; 0 }           // marker: zero bits follow
        }
      }
    }

    private def bit(): Int = {
      if (nbits == 0) { cur = nextByte(); nbits = 8 }
      nbits -= 1
      (cur >> nbits) & 1
    }

    /** Decode one binary decision in the context `stats(idx)`. */
    def decode(stats: Array[Byte], idx: Int): Int = {
      val sv = stats(idx) & 0xff
      val s = sv & 0x7f
      var mps = sv >> 7
      val qe = Qe(s)
      val sub = a - qe
      var d = 0
      if (off < sub) {
        d = if (sub >= qe) mps else 1 - mps
        a = sub
      } else {
        off -= sub
        d = if (sub >= qe) 1 - mps else mps
        a = qe
      }
      // state adapts only when the symbol renormalizes (MPS without
      // renorm leaves the bin untouched — the encoder's early return)
      if (d != mps) {
        if (Sw(s) == 1) mps = 1 - mps
        stats(idx) = ((mps << 7) | Nlps(s)).toByte
      } else if (a < 0x8000) {
        stats(idx) = ((mps << 7) | Nmps(s)).toByte
      }
      while (a < 0x8000) {
        a <<= 1
        off = (off << 1) | bit()
      }
      d
    }
  }

  /** QM encoder — the exact dual of [[Decoder]], byte-for-byte
    * equal to libjpeg's arithmetic output on the golden fixtures
    * (carry propagation through stacked 0xFF bytes, FF00 stuffing,
    * deferred trailing zeros, Annex D.1.8 termination). */
  final class Encoder {
    private var a = 0x10000
    private var c = 0L
    private var ct = 11
    private var buffer = -1
    private var sc = 0 // stacked 0xFF bytes awaiting carry resolution
    private var zc = 0 // deferred 0x00 bytes (dropped if trailing)
    private val out = new java.io.ByteArrayOutputStream()

    private def emit(x: Int): Unit = out.write(x & 0xff)
    private def flushZc(): Unit = { while (zc > 0) { emit(0); zc -= 1 } }

    def encode(stats: Array[Byte], idx: Int, bitv: Int): Unit = {
      val sv = stats(idx) & 0xff
      val s = sv & 0x7f
      var mps = sv >> 7
      val qe = Qe(s)
      a -= qe
      if (bitv != mps) { // LPS
        if (a >= qe) { c += a; a = qe } // else conditional exchange: LPS keeps the base
        if (Sw(s) == 1) mps = 1 - mps
        stats(idx) = ((mps << 7) | Nlps(s)).toByte
      } else { // MPS
        if (a >= 0x8000) return // no renorm → no adaptation
        if (a < qe) { c += a; a = qe } // conditional exchange: MPS takes the top
        stats(idx) = ((mps << 7) | Nmps(s)).toByte
      }
      while ({
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) {
          val temp = (c >> 19).toInt
          if (temp > 0xFF) { // carry ripples into emitted bytes
            if (buffer >= 0) {
              flushZc()
              emit(buffer + 1)
              if (buffer + 1 == 0xFF) emit(0)
            }
            while (sc > 0) { emit(0); sc -= 1 } // 0xFF + carry → 0x00
            buffer = temp & 0xFF
          } else if (temp == 0xFF) {
            sc += 1 // stack: a later carry may still change it
          } else {
            if (buffer == 0) zc += 1
            else if (buffer >= 0) { flushZc(); emit(buffer) }
            while (sc > 0) { flushZc(); emit(0xFF); emit(0); sc -= 1 }
            buffer = temp
          }
          c &= 0x7FFFF
          ct = 8
        }
        a < 0x8000
      }) ()
    }

    /** Annex D.1.8 termination: pick the code value with the most
      * trailing zeros inside the final interval, flush, drop
      * trailing zero bytes. Returns the entropy segment. */
    def finish(): Array[Byte] = {
      val temp = (a - 1 + c) & 0xFFFF0000L
      c = if (temp < c) temp + 0x8000L else temp
      c <<= ct
      if ((c & 0xF8000000L) != 0) {
        if (buffer >= 0) {
          flushZc()
          emit(buffer + 1)
          if (buffer + 1 == 0xFF) emit(0)
        }
        while (sc > 0) { emit(0); sc -= 1 }
      } else {
        if (buffer > 0) { flushZc(); emit(buffer) }
        else if (buffer == 0) zc += 1
        while (sc > 0) { flushZc(); emit(0xFF); emit(0); sc -= 1 }
      }
      if ((c & 0x7FFF800L) != 0) {
        flushZc()
        val b1 = ((c >> 19) & 0xFF).toInt
        emit(b1)
        if (b1 == 0xFF) emit(0)
        if ((c & 0x7F800L) != 0) {
          val b2 = ((c >> 11) & 0xFF).toInt
          emit(b2)
          if (b2 == 0xFF) emit(0)
        }
      }
      out.toByteArray
    }
  }
}
