package graft.operators

/** Baseline-sequential JPEG, pure JVM — grayscale AND YCbCr color
  * (1 or 3 components, sampling factors 1–4 per axis — the full T.81
  * legal range since r9: 4:4:4, 4:2:2, 4:2:0, 4:1:1 and the 3×/
  * vertical variants; interleaved MCUs capped at the spec's 10 data
  * units). The last media tier whose sample decode was a declared
  * stub, now a real decoder on both the luma and chroma paths.
  *
  * DECODER ([[decodeImage]]): full marker parse (DQT/DHT/SOF0/SOS/DRI,
  * APPn/COM skipped), canonical Huffman tables (JPEG spec F.2.2.3
  * mincode/maxcode/valptr), byte-unstuffed entropy reader, restart
  * markers, per-component DC prediction, run/size AC decode with
  * EOB/ZRL, dequantize + de-zigzag, exact double-precision 8×8 IDCT,
  * level shift + clamp, interleaved-MCU component planes, chroma
  * upsampled by sample replication (nearest — the deterministic
  * choice an oracle can reproduce; libjpeg's "fancy" triangle filter
  * differs only on non-constant chroma, which the specs account for),
  * JFIF YCbCr→RGB (R = Y + 1.402·(Cr−128), G = Y − 0.344136·(Cb−128)
  * − 0.714136·(Cr−128), B = Y + 1.772·(Cb−128), floor(x+0.5) then
  * clamp), partial edge blocks cropped. (r8) 4-component Adobe
  * CMYK/YCCK frames decode too: the APP14 transform tag picks the
  * model (0/absent = stored inverted CMYK, 2 = YCCK — YCbCr over the
  * inverted CMY; 3-component transform 0 = stored RGB), and RGB
  * renders as channel·K/255 over the stored Adobe-inverted values,
  * libjpeg's convention, floor(x+0.5) rounded. (r8) ARITHMETIC
  * entropy coding decodes too — SOF9 sequential and SOF10
  * progressive frames through the T.81 Annex D QM coder
  * ([[JpegArith]], validated byte-exactly against the system
  * libjpeg via the golden corpus in test resources; all four
  * progressive arithmetic scan types, restart markers, DAC
  * conditioning). (r9) The T.81 matrix is TOTAL: 12-bit frames
  * decode via [[decode12]], lossless SOF3 via [[decodeLossless]],
  * and sampling factors run the full legal 1–4 range under the
  * B.2.3 MCU cap (goldens from the system libjpeg, gen_samp.c).
  * (r10) [[decode12]] carries the full non-hierarchical DCT matrix:
  * progressive SOF2 and arithmetic SOF9/SOF10 at precision 12
  * through the SAME scan machinery as the 8-bit paths
  * ([[ProgHuff]]/[[ArithScan]] — the coefficient procedures are
  * precision-independent; the one knob is the DC category cap,
  * 11 vs 15). Remaining refusals — hierarchical/differential
  * frames, 2-component frames — are structural (SOF dispatch),
  * refused, never mis-decoded. The CMYK specs gate the
  * formulas against the tile encoder and cross-check the JDK at the
  * RASTER level (its SimpleCMYKColorSpace raster independently
  * confirms the inversion and the YCCK→R'G'B' transform; its final
  * getRGB applies ICC/sRGB gamma and is not the comparison surface).
  * [[decodeGray]] keeps its
  * original contract: single-component files only, color → None.
  *
  * ENCODER ([[encodeDcOnlyGray]], [[encodeDcOnlyColor]]): a real
  * baseline encoder restricted to per-8×8-block CONSTANT tiles — each
  * block carries only a DC coefficient (difference-coded through the
  * standard Annex K DC table) and an EOB. The point of the
  * restriction: a constant block with an EVEN value and a flat quant
  * table of 16 reconstructs BIT-EXACTLY (DC = 8·(c−128)/16 = (c−128)/2
  * is integral, so quantization loses nothing and the IDCT of a
  * DC-only block is an exact constant) — which gives lossy JPEG a
  * deterministic formula-twin gate, per channel in the color case
  * (exact Y/Cb/Cr constants feed the exact-double RGB formulas above).
  * The color encoder writes 4:4:4 (one block per component per MCU)
  * or 4:2:0 (four Y blocks + one Cb + one Cr per 16×16 MCU, chroma
  * constant per MCU — which sample replication reconstructs exactly).
  * The AC/entropy paths the restriction skips are covered by the
  * ImageIO cross-check specs (foreign full-AC gradients, tolerance ±1
  * per the spec's IDCT accuracy allowance).
  *
  * Tables: the DC/AC luminance Huffman tables are the public ones
  * from the JPEG standard (ITU T.81 Annex K.3.3).
  */
object JpegCodec {

  // ---- canonical Huffman (T.81 F.2.2.3) -------------------------------

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val maxcode = Array.fill(17)(-1)
    val mincode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.bit()
      while (l <= 16 && (maxcode(l) < 0 || code > maxcode(l))) {
        code = (code << 1) | br.bit(); l += 1
      }
      if (l > 16) throw new IllegalArgumentException("bad huffman code")
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** Entropy-segment bit reader: FF00 unstuffed; a real marker mid-read
    * raises (callers treat any throw as corrupt). Restart markers are
    * consumed explicitly via [[restart]]. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalArgumentException("entropy underrun")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new IllegalArgumentException("entropy underrun")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1
          else throw new IllegalArgumentException(f"marker ff$m%02x inside entropy data")
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        ((b(pos + 1) & 0xff) & 0xf8) != 0xd0)
        throw new IllegalArgumentException("expected restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Progressive-Huffman scan machinery (T.81 F.2.4), shared between
    * the 8-bit ([[decodeImage]]) and 12-bit ([[decode12]]) surfaces —
    * coefficient decode is precision-independent; the single knob is
    * the DC magnitude-category cap (11 at 8-bit, 15 at 12-bit,
    * Tables F.1/F.6). Blocks accumulate into `Comp.coef` across
    * scans; a restart resets `Comp.pred` and [[eobrun]] at the
    * caller. EOB-run conventions per scan type are documented at the
    * field. */
  private final class ProgHuff(br: BitReader, ss: Int, se: Int,
      ah: Int, al: Int, dcCap: Int) {
    /** EOB-run state. Conventions differ by scan type (and never
      * mix — the type is fixed per scan): in AC FIRST scans the
      * value counts blocks remaining AFTER the one that read the
      * EOBn symbol; in AC REFINEMENT scans it counts blocks still
      * owed a correction pass INCLUDING the current one. */
    var eobrun = 0

    def dcBlock(c: Comp, off: Int, dc: Huff): Unit =
      if (ah == 0) { // first DC scan: sequential diffs << Al
        val s = dc.decode(br)
        if (s > dcCap) throw new IllegalArgumentException("bad DC size")
        c.pred += extend(br.receive(s), s)
        c.coef(off) = c.pred << al
      } else { // refinement: one raw bit per block
        if (br.bit() == 1) c.coef(off) |= 1 << al
      }

    def acFirstBlock(c: Comp, off: Int, ac: Huff): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = ac.decode(br)
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            return
          }
        } else {
          k += r
          if (k > se) throw new IllegalArgumentException("AC overrun")
          c.coef(off + k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    def acRefineBlock(c: Comp, off: Int, ac: Huff): Unit = {
      val p1 = 1 << al
      var k = ss
      if (eobrun == 0) {
        var toEob = false
        while (k <= se && !toEob) {
          val rs = ac.decode(br)
          var r = rs >> 4; val s = rs & 0x0f
          var newVal = 0
          if (s != 0) {
            if (s != 1) throw new IllegalArgumentException("bad refine size")
            newVal = if (br.bit() == 1) p1 else -p1
          } else if (r != 15) { // EOBn: current block still gets
            eobrun = (1 << r)   // its correction pass below
            if (r > 0) eobrun += br.receive(r)
            toEob = true
          }
          if (!toEob) {
            // advance past r zero-history positions, appending a
            // correction bit to every nonzero coefficient passed
            var placed = false
            while (k <= se && !placed) {
              val idx = off + k
              if (c.coef(idx) != 0) {
                if (br.bit() == 1 && (math.abs(c.coef(idx)) & p1) == 0)
                  c.coef(idx) += (if (c.coef(idx) > 0) p1 else -p1)
              } else if (r == 0) {
                if (newVal != 0) c.coef(idx) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
            if (!placed && newVal != 0)
              throw new IllegalArgumentException("refine overrun")
          }
        }
      }
      if (eobrun > 0) { // correction-only pass for this block
        while (k <= se) {
          val idx = off + k
          if (c.coef(idx) != 0) {
            if (br.bit() == 1 && (math.abs(c.coef(idx)) & p1) == 0)
              c.coef(idx) += (if (c.coef(idx) > 0) p1 else -p1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }
  }

  /** Arithmetic-coded scan state (T.81 F.1.4 decode direction,
    * mirrored from the flow validated byte-exactly against libjpeg on
    * the golden corpus): QM decoder registers, per-table statistics
    * areas, and per-component DC prediction/conditioning — reset
    * together at scan start and at every restart marker (D.2.5).
    * Shared by the 8-bit sequential (SOF9) and progressive (SOF10)
    * paths and the 12-bit surface — the coefficient procedures are
    * precision-independent (magnitude categories bounded by the
    * 0x8000 overrun guard, wide enough for 12-bit values). Sequential
    * AC decode IS the first-scan procedure over band [1,63] at Al=0,
    * so [[acFirst]] serves both. */
  private final class ArithScan(b: Array[Byte], start: Int,
      dcTables: Seq[Int], acTables: Seq[Int], nComps: Int,
      dcCondL: Int => Int, dcCondU: Int => Int, acCondK: Int => Int) {
    var dec = new JpegArith.Decoder(b, start)
    private def mkDc() = dcTables.distinct.map(t => t -> new Array[Byte](64)).toMap
    private def mkAc() = acTables.distinct.map(t => t -> new Array[Byte](256)).toMap
    private var dcStats = mkDc()
    private var acStats = mkAc()
    private var fixedBin = JpegArith.newFixedBin()
    val lastDc = new Array[Int](nComps)
    private val dcCtx = new Array[Int](nComps)

    /** Skip to the next RSTn and re-init EVERYTHING; false when no
      * marker remains (truncation). */
    def restartReinit(): Boolean = {
      var p = dec.pos
      while (p + 1 < b.length &&
        !((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) >= 0xd0 && (b(p + 1) & 0xff) <= 0xd7))
        p += 1
      if (p + 1 >= b.length) return false
      dec = new JpegArith.Decoder(b, p + 2)
      dcStats = mkDc(); acStats = mkAc()
      fixedBin = JpegArith.newFixedBin()
      java.util.Arrays.fill(lastDc, 0)
      java.util.Arrays.fill(dcCtx, 0)
      true
    }

    /** One DC difference (F.1.4.4.1) for scan-component `csi` through
      * table `dcId`; updates and returns the running DC prediction. */
    def decodeDc(csi: Int, dcId: Int): Int = {
      val dst = dcStats(dcId)
      val ctx = dcCtx(csi)
      if (dec.decode(dst, ctx) == 0) dcCtx(csi) = 0
      else {
        val sign = dec.decode(dst, ctx + 1)
        var sti = ctx + 2 + sign
        var mcat = dec.decode(dst, sti)
        if (mcat != 0) {
          sti = 20 // X1
          mcat = 1
          while (dec.decode(dst, sti) != 0) {
            mcat <<= 1
            if (mcat == 0x8000) throw new IllegalArgumentException("DC cat overrun")
            sti += 1
          }
        }
        // conditioning category for the NEXT block
        dcCtx(csi) =
          if (mcat < ((1 << dcCondL(dcId)) >> 1)) 0
          else if (mcat > ((1 << dcCondU(dcId)) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        var v = mcat
        sti += 14
        var mm = mcat
        while (mm > 1) {
          mm >>= 1
          if (dec.decode(dst, sti) != 0) v |= mm
        }
        v += 1
        if (sign != 0) v = -v
        lastDc(csi) += v
      }
      lastDc(csi)
    }

    /** One DC refinement bit through the fixed (uncond.) bin. */
    def dcRefineBit(): Int = dec.decode(fixedBin, 0)

    /** AC band decode (F.1.4.4.2 / first progressive scan) into
      * zigzag positions `coef(off+k)`, values << Al. */
    def acFirst(acId: Int, coef: Array[Int], off: Int, ss: Int, se: Int, al: Int): Unit = {
      val ast = acStats(acId)
      var k = ss
      var eob = false
      while (k <= se && !eob) {
        var sti = 3 * (k - 1)
        if (dec.decode(ast, sti) != 0) eob = true // EOB
        else {
          while (dec.decode(ast, sti + 1) == 0) {
            sti += 3; k += 1
            if (k > se) throw new IllegalArgumentException("AC overrun")
          }
          val sign = dec.decode(fixedBin, 0)
          sti += 2
          var mcat = dec.decode(ast, sti)
          if (mcat != 0) {
            if (dec.decode(ast, sti) != 0) {
              mcat = 2
              sti = if (k <= acCondK(acId)) 189 else 217
              while (dec.decode(ast, sti) != 0) {
                mcat <<= 1
                if (mcat == 0x8000) throw new IllegalArgumentException("AC cat overrun")
                sti += 1
              }
            }
          }
          var v = mcat
          sti += 14
          var mm = mcat
          while (mm > 1) {
            mm >>= 1
            if (dec.decode(ast, sti) != 0) v |= mm
          }
          v += 1
          if (sign != 0) v = -v
          coef(off + k) = v << al
          k += 1
        }
      }
    }

    /** AC refinement scan (F.2.4.3 in the arithmetic domain):
      * correction bits, new significances through st+1, EOB decisions
      * only past the previous scan's last nonzero index. */
    def acRefine(acId: Int, coef: Array[Int], off: Int, ss: Int, se: Int, al: Int): Unit = {
      val ast = acStats(acId)
      val p1 = 1 << al
      val m1 = -1 << al
      var kex = se
      while (kex > 0 && coef(off + kex) == 0) kex -= 1
      var k = ss
      var eob = false
      while (k <= se && !eob) {
        var sti = 3 * (k - 1)
        if (k > kex && dec.decode(ast, sti) != 0) eob = true
        else {
          var runDone = false
          while (!runDone) {
            val cv = coef(off + k)
            if (cv != 0) {
              if (dec.decode(ast, sti + 2) != 0)
                coef(off + k) = cv + (if (cv < 0) m1 else p1)
              runDone = true
            } else if (dec.decode(ast, sti + 1) != 0) {
              coef(off + k) =
                if (dec.decode(fixedBin, 0) != 0) m1 else p1
              runDone = true
            } else {
              sti += 3; k += 1
              if (k > se) throw new IllegalArgumentException("AC refine overrun")
            }
          }
          k += 1
        }
      }
    }
  }

  /** Zig-zag index → (row-major) position. */
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var x = 0; var y = 0
    for (i <- 0 until 64) {
      z(i) = y * 8 + x
      if ((x + y) % 2 == 0) { // moving up-right
        if (x == 7) y += 1 else if (y == 0) x += 1 else { x += 1; y -= 1 }
      } else { // moving down-left
        if (y == 7) x += 1 else if (x == 0) y += 1 else { x -= 1; y += 1 }
      }
    }
    z
  }

  private val CosTable: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Exact double-precision 8×8 IDCT (T.81 A.3.3), output unshifted. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += C(u) * C(v) * coef(v * 8 + u) * CosTable(x)(u) * CosTable(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = s / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a baseline-sequential or progressive GRAYSCALE JPEG to
    * (w, h, row-major 8-bit pixels). None for anything else — color
    * frames (use [[decodeImage]]), truncation, entropy corruption. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeImage(b) match {
      case Some((w, h, 1, px)) => Some((w, h, px))
      case _ => None
    }

  /** Per-frame component state: sampling factors, table ids, and the
    * decoded plane at the component's natural resolution (padded to
    * whole blocks). Progressive frames also carry the cross-scan
    * coefficient accumulator (`coef`, zigzag order per block) and the
    * padded block-grid dims. */
  private final class Comp(val id: Int, val hs: Int, val vs: Int, val tq: Int) {
    var dcId = 0; var acId = 0
    var plane: Array[Byte] = null
    var pw = 0 // plane row stride (blocksAcross * 8)
    var pred = 0
    var bw = 0; var bh = 0 // padded block-grid dims (MCU multiples)
    var coef: Array[Int] = null
  }

  /** Assemble the decoded component planes into the output raster:
    * gray crop for 1 component, chroma upsample (sample replication) +
    * JFIF YCbCr→RGB for 3. Shared by the baseline and progressive
    * paths. */
  private def emitImage(comps: Array[Comp], w: Int, h: Int,
      hmax: Int, vmax: Int, transform: Int): Option[(Int, Int, Int, Array[Byte])] =
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(c.plane, y * c.pw, out, y * w, w)
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      // chroma upsampled by sample replication (integer-floor source
      // coordinate), then JFIF YCbCr→RGB with floor(x+0.5) rounding —
      // both choices deterministic and reproducible in plain SQL by
      // the oracle twin. The Adobe APP14 transform picks the color
      // model: 3 comps are YCbCr unless transform 0 says stored RGB;
      // 4 comps are Adobe-convention INVERTED CMYK (the only CMYK
      // JPEGs that exist in practice are Adobe-written, which store
      // 255−value), plain (transform 0/absent) or YCCK (transform 2 —
      // the same YCbCr transform applied to the inverted CMY), and
      // render to RGB as channel·K/255 on the stored (inverted)
      // values — libjpeg's convention, floor(x+0.5) rounded.
      val ycc = (comps.length == 3 && transform != 0) ||
        (comps.length == 4 && transform == 2)
      def samp(c: Comp, x: Int, y: Int): Int =
        c.plane((y * c.vs / vmax) * c.pw + (x * c.hs / hmax)) & 0xff
      def clamp8i(d: Double): Int = {
        val v = math.floor(d + 0.5).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, bl) =
            if (ycc) {
              val lum = samp(comps(0), x, y)
              val pb = samp(comps(1), x, y) - 128
              val pr = samp(comps(2), x, y) - 128
              (clamp8i(lum + 1.402 * pr),
                clamp8i(lum - 0.344136 * pb - 0.714136 * pr),
                clamp8i(lum + 1.772 * pb))
            } else
              (samp(comps(0), x, y), samp(comps(1), x, y), samp(comps(2), x, y))
          val o = (y * w + x) * 3
          if (comps.length == 4) {
            val k = samp(comps(3), x, y)
            out(o) = clamp8i(r * k / 255.0).toByte
            out(o + 1) = clamp8i(g * k / 255.0).toByte
            out(o + 2) = clamp8i(bl * k / 255.0).toByte
          } else {
            out(o) = r.toByte
            out(o + 1) = g.toByte
            out(o + 2) = bl.toByte
          }
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }

  /** Decode a baseline-sequential OR progressive (SOF2) JPEG to
    * (w, h, channels, pixels): channels = 1 (grayscale, w·h bytes) or
    * 3 (color, w·h·3 interleaved RGB). Sampling factors 1–4 per axis
    * (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1 and transposes; interleaved MCUs
    * hold at most the spec's 10 data units). Baseline takes a single
    * interleaved scan; progressive accumulates coefficients across
    * scans (DC first + refinement, per-band AC first with EOB runs,
    * AC successive-approximation refinement) and reconstructs at EOI.
    * 4-component Adobe CMYK/YCCK frames render to RGB (channels = 3)
    * per the object scaladoc's inverted-value convention; SOF9/SOF10
    * arithmetic frames decode via [[JpegArith]]; 8-bit
    * extended-sequential (SOF1) frames decode on the baseline path
    * (identical entropy coding, wider table allowance).
    * 12-bit frames ([[decode12]] is their surface), lossless frames
    * ([[decodeLossless]]), hierarchical/differential frames,
    * 2-component frames, sampling factors > 4, truncation and entropy
    * corruption all return None, never a mis-decode. */
  def decodeImage(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = try {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    val qt = scala.collection.mutable.Map[Int, Array[Int]]()
    val hDC = scala.collection.mutable.Map[Int, Huff]()
    val hAC = scala.collection.mutable.Map[Int, Huff]()
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var dri = 0
    var progressive = false
    var scansDone = 0
    var adobeTransform = -1 // APP14 color-transform tag; -1 = absent
    var arith = false       // SOF9: sequential frame, arithmetic entropy
    // DAC conditioning (T.81 defaults): DC L=0/U=1, AC Kx=5 per table
    val dcCondL = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val dcCondU = scala.collection.mutable.Map[Int, Int]().withDefaultValue(1)
    val acCondK = scala.collection.mutable.Map[Int, Int]().withDefaultValue(5)
    def u16(j: Int) = ((b(j) & 0xff) << 8) | (b(j + 1) & 0xff)
    while (i + 2 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // SOI/RSTn: bare
      else if (m == 0xd9) {                                 // EOI
        if (!progressive || scansDone == 0) return None
        // progressive reconstruction: dequantize + de-zigzag + IDCT
        // every accumulated block, then the shared plane assembly
        val hmax = comps.map(_.hs).max
        val vmax = comps.map(_.vs).max
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt.getOrElse(c.tq, return None)
          c.pw = c.bw * 8
          c.plane = new Array[Byte](c.pw * c.bh * 8)
          var blk = 0
          while (blk < c.bw * c.bh) {
            val off = blk * 64
            val d = new Array[Double](64)
            var zz = 0
            while (zz < 64) {
              d(Zigzag(zz)) = c.coef(off + zz).toDouble * q(zz)
              zz += 1
            }
            val px = idct(d)
            val ox0 = (blk % c.bw) * 8
            val oy0 = (blk / c.bw) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(px(yy * 8 + xx) + 128.0).toInt
                c.plane((oy0 + yy) * c.pw + ox0 + xx) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
            blk += 1
          }
          ci += 1
        }
        return emitImage(comps, w, h, hmax, vmax, adobeTransform)
      }
      else if (i + 4 > b.length) return None
      else {
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        var jump = -1 // progressive scans set this past their entropy data
        m match {
          case 0xdb => // DQT: one or more (precision|id, 64 values)
            var j = seg
            while (j < i + 2 + len) {
              val pq = (b(j) & 0xff) >> 4; val id = b(j) & 0x0f
              if (pq != 0) return None // 8-bit tables only
              if (j + 65 > i + 2 + len) return None
              qt(id) = Array.tabulate(64)(k => b(j + 1 + k) & 0xff)
              j += 65
            }
          case 0xc4 => // DHT: one or more tables
            var j = seg
            while (j < i + 2 + len) {
              val tc = (b(j) & 0xff) >> 4; val th = b(j) & 0x0f
              if (j + 17 > i + 2 + len) return None
              val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xff)
              val n = bits.sum
              if (j + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => b(j + 17 + k) & 0xff)
              val huff = new Huff(bits, vals)
              if (tc == 0) hDC(th) = huff else hAC(th) = huff
              j += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca => // SOF0 / SOF1 extended / SOF2 progressive / SOF9-SOF10 arithmetic
            progressive = m == 0xc2 || m == 0xca
            arith = m == 0xc9 || m == 0xca
            // 8-bit only here: SOF1 at 8 bits is entropy-identical to
            // baseline; 12-bit SOF1 has its own surface ([[decode12]])
            if (b(seg) != 8) return None
            h = u16(seg + 1); w = u16(seg + 3)
            val nComp = b(seg + 5) & 0xff
            if (nComp != 1 && nComp != 3 && nComp != 4)
              return None // gray, YCbCr/RGB, or (r8) Adobe CMYK/YCCK
            if (i + 2 + len < seg + 6 + 3 * nComp) return None
            comps = Array.tabulate(nComp) { c =>
              val o = seg + 6 + 3 * c
              val hv = b(o + 1) & 0xff
              new Comp(b(o) & 0xff, hv >> 4, hv & 0x0f, b(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4))
              return None // sampling factors 1–4 (the full T.81 legal range, r9)
            // T.81 B.2.3 caps INTERLEAVED-scan MCUs at 10 data units.
            // A sequential multi-component frame has exactly one scan
            // and it is interleaved, so the cap is a frame property
            // here; a progressive frame may use only non-interleaved
            // (Ns = 1) scans and stay legal past the sum, so its cap
            // moves to each SOS (r10 — previously over-strict at SOF)
            if (!progressive && nComp > 1 && comps.map(c => c.hs * c.vs).sum > 10)
              return None
            if (nComp == 1 && (comps(0).hs != 1 || comps(0).vs != 1))
              return None // single-component frames are 1x1 by contract
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xcb | 0xcd | 0xce | 0xcf =>
            // lossless has its own surface ([[decodeLossless]]);
            // hierarchical/differential stay refused
            return None
          case 0xcc => // DAC: arithmetic conditioning per table
            var j = seg
            while (j + 1 < i + 2 + len) {
              val tc = (b(j) & 0xff) >> 4; val tb = b(j) & 0x0f
              val v = b(j + 1) & 0xff
              if (tc == 0) { dcCondL(tb) = v & 0x0f; dcCondU(tb) = v >> 4 }
              else acCondK(tb) = v
              j += 2
            }
          case 0xdd => // DRI
            dri = u16(seg)
          case 0xee => // APP14 "Adobe": the color-transform tag
            if (len >= 14 && b(seg) == 'A' && b(seg + 1) == 'd' &&
              b(seg + 2) == 'o' && b(seg + 3) == 'b' && b(seg + 4) == 'e')
              adobeTransform = b(seg + 11) & 0xff
          case 0xda if arith && !progressive => // SOF9: one interleaved arithmetic scan
            if (w <= 0 || h <= 0 || comps == null) return None
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None // one interleaved scan
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcId = (b(j + 1) & 0xff) >> 4
              c.acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            comps.foreach { c =>
              c.pw = mcusX * c.hs * 8
              c.plane = new Array[Byte](c.pw * mcusY * c.vs * 8)
            }
            // shared QM scan state ([[ArithScan]]); a restart re-inits
            // decoder registers, statistics, DC predictions and
            // conditioning contexts together
            val as = new ArithScan(b, i + 2 + len,
              comps.map(_.dcId).toSeq, comps.map(_.acId).toSeq, comps.length,
              dcCondL, dcCondU, acCondK)
            var mcu = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  if (!as.restartReinit()) return None
                }
                var ci = 0
                while (ci < comps.length) {
                  val c = comps(ci)
                  val q = qt.getOrElse(c.tq, return None)
                  var v2 = 0
                  while (v2 < c.vs) {
                    var h2 = 0
                    while (h2 < c.hs) {
                      // one block through the shared procedures:
                      // DC (F.1.4.4.1) then the full AC band
                      // (F.1.4.4.2 = acFirst over [1,63] at Al=0),
                      // zigzag Ints dequantized after
                      val zz = new Array[Int](64)
                      zz(0) = as.decodeDc(ci, c.dcId)
                      as.acFirst(c.acId, zz, 0, 1, 63, 0)
                      val coef = new Array[Double](64)
                      var k = 0
                      while (k < 64) {
                        coef(Zigzag(k)) = zz(k).toDouble * q(k)
                        k += 1
                      }
                      val px = idct(coef)
                      val ox0 = (mx * c.hs + h2) * 8
                      val oy0 = (my * c.vs + v2) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          val v = math.round(px(yy * 8 + xx) + 128.0).toInt
                          c.plane((oy0 + yy) * c.pw + ox0 + xx) =
                            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                          xx += 1
                        }
                        yy += 1
                      }
                      h2 += 1
                    }
                    v2 += 1
                  }
                  ci += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
            // structural integrity: zero bits past a REAL marker are
            // the legitimate Annex D tail; the same bits past a
            // truncation would mis-decode into plausible garbage, so
            // refuse unless the stream still carries its EOI
            if (as.dec.hitEnd) return None
            var pe = as.dec.pos
            var sawEoi = false
            while (pe + 1 < b.length && !sawEoi) {
              if ((b(pe) & 0xff) == 0xff && (b(pe + 1) & 0xff) == 0xd9) sawEoi = true
              pe += 1
            }
            if (!sawEoi) return None
            return emitImage(comps, w, h, hmax, vmax, adobeTransform)

          case 0xda if progressive && arith => // SOF10: progressive arithmetic scan
            if (w <= 0 || h <= 0 || comps == null) return None
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels / 4) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length) return None
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            if (comps(0).coef == null) comps.foreach { c =>
              c.bw = mcusX * c.hs
              c.bh = mcusY * c.vs
              c.coef = new Array[Int](c.bw * c.bh * 64)
            }
            val scanComps = new Array[Comp](ns)
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              scanComps(si) = comps.find(_.id == cid).getOrElse(return None)
              scanComps(si).dcId = (b(j + 1) & 0xff) >> 4
              scanComps(si).acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            // T.81 B.2.3 where it actually applies (r10): only an
            // INTERLEAVED scan (Ns > 1) is MCU-capped at 10 data units
            if (ns > 1 && scanComps.map(c => c.hs * c.vs).sum > 10) return None
            val ss = b(j) & 0xff
            val se = b(j + 1) & 0xff
            val ah = (b(j + 2) & 0xff) >> 4
            val al = b(j + 2) & 0x0f
            if (ss > se || se > 63 || al > 13 || ah > 14) return None
            if (ss == 0 && se != 0) return None // DC scans are band [0,0]
            if (ss > 0 && ns != 1) return None  // AC scans: one component
            if (ah != 0 && ah != al + 1) return None
            // per-scan state ([[ArithScan]]): T.81 resets the
            // statistics, the decoder registers, and the DC
            // prediction/conditioning at every scan (and at every
            // restart inside one)
            val as = new ArithScan(b, i + 2 + len,
              scanComps.map(_.dcId).toSeq, scanComps.map(_.acId).toSeq, ns,
              dcCondL, dcCondU, acCondK)
            // decode one block's DC (first or refinement) at coef `off`
            def dcBlock(csi: Int, c: Comp, off: Int): Unit =
              if (ah == 0) // DC first: the sequential model, << Al
                c.coef(off) = as.decodeDc(csi, c.dcId) << al
              else { // DC refinement: one bit via the fixed bin
                if (as.dcRefineBit() != 0) c.coef(off) |= (1 << al)
              }
            if (ss == 0) { // DC scan
              var mcu = 0
              if (ns == comps.length) { // interleaved over the MCU grid
                var my = 0
                while (my < mcusY) {
                  var mx = 0
                  while (mx < mcusX) {
                    if (dri > 0 && mcu > 0 && mcu % dri == 0 && !as.restartReinit()) return None
                    var csi = 0
                    while (csi < ns) {
                      val c = scanComps(csi)
                      var v2 = 0
                      while (v2 < c.vs) {
                        var h2 = 0
                        while (h2 < c.hs) {
                          dcBlock(csi, c,
                            ((my * c.vs + v2) * c.bw + mx * c.hs + h2) * 64)
                          h2 += 1
                        }
                        v2 += 1
                      }
                      csi += 1
                    }
                    mcu += 1
                    mx += 1
                  }
                  my += 1
                }
              } else { // single component: its own block grid
                val c = scanComps(0)
                var blk = 0
                while (blk < c.bw * c.bh) {
                  if (dri > 0 && blk > 0 && blk % dri == 0 && !as.restartReinit()) return None
                  dcBlock(0, c, blk * 64)
                  blk += 1
                }
              }
            } else { // AC scan: one component, its own block grid
              val c = scanComps(0)
              var blk = 0
              while (blk < c.bw * c.bh) {
                if (dri > 0 && blk > 0 && blk % dri == 0 && !as.restartReinit()) return None
                val off = blk * 64
                if (ah == 0) as.acFirst(c.acId, c.coef, off, ss, se, al)
                else as.acRefine(c.acId, c.coef, off, ss, se, al)
                blk += 1
              }
            }
            if (as.dec.hitEnd) return None
            scansDone += 1
            // resume marker parsing at the next real marker (FF00 data
            // and RSTn inside the entropy have been consumed/handled)
            var pe = as.dec.pos
            while (pe + 1 < b.length &&
              !((b(pe) & 0xff) == 0xff && (b(pe + 1) & 0xff) != 0 &&
                !((b(pe + 1) & 0xff) >= 0xd0 && (b(pe + 1) & 0xff) <= 0xd7)))
              pe += 1
            jump = pe

          case 0xda if progressive => // progressive scan: accumulate
            if (w <= 0 || h <= 0 || comps == null) return None
            // tighter cap than baseline: the cross-scan coefficient
            // accumulator holds 4 bytes per sample per component
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels / 4) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length) return None
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            if (comps(0).coef == null) comps.foreach { c =>
              c.bw = mcusX * c.hs
              c.bh = mcusY * c.vs
              c.coef = new Array[Int](c.bw * c.bh * 64)
            }
            val scanComps = new Array[Comp](ns)
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              scanComps(si) = comps.find(_.id == cid).getOrElse(return None)
              scanComps(si).dcId = (b(j + 1) & 0xff) >> 4
              scanComps(si).acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            // T.81 B.2.3 where it actually applies (r10): only an
            // INTERLEAVED scan (Ns > 1) is MCU-capped at 10 data units
            if (ns > 1 && scanComps.map(c => c.hs * c.vs).sum > 10) return None
            val ss = b(j) & 0xff
            val se = b(j + 1) & 0xff
            val ah = (b(j + 2) & 0xff) >> 4
            val al = b(j + 2) & 0x0f
            if (ss > se || se > 63 || al > 13 || ah > 14) return None
            if (ss == 0 && se != 0) return None // DC scans are band [0,0]
            if (ss > 0 && ns != 1) return None  // AC scans: one component
            if (ah != 0 && ah != al + 1) return None // successive approx steps by 1 bit
            val br = new BitReader(b, i + 2 + len)
            scanComps.foreach(_.pred = 0)
            // shared scan machinery ([[ProgHuff]]); 8-bit DC cap 11
            val ph = new ProgHuff(br, ss, se, ah, al, 11)

            if (ns > 1) { // interleaved scan (DC band only, per above)
              val dcs: Array[Huff] =
                if (ah == 0) {
                  val arr = new Array[Huff](ns)
                  var k2 = 0
                  while (k2 < ns) {
                    arr(k2) = hDC.getOrElse(scanComps(k2).dcId, return None)
                    k2 += 1
                  }
                  arr
                } else new Array[Huff](ns) // refinement reads raw bits
              var mcu = 0
              var my = 0
              while (my < mcusY) {
                var mx = 0
                while (mx < mcusX) {
                  if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                    br.restart(); scanComps.foreach(_.pred = 0); ph.eobrun = 0
                  }
                  var ci = 0
                  while (ci < ns) {
                    val c = scanComps(ci)
                    var v2 = 0
                    while (v2 < c.vs) {
                      var h2 = 0
                      while (h2 < c.hs) {
                        val blk = (my * c.vs + v2) * c.bw + mx * c.hs + h2
                        ph.dcBlock(c, blk * 64, dcs(ci))
                        h2 += 1
                      }
                      v2 += 1
                    }
                    ci += 1
                  }
                  mcu += 1
                  mx += 1
                }
                my += 1
              }
            } else { // non-interleaved: the component's own block grid
              val c = scanComps(0)
              val cw = (w * c.hs + hmax - 1) / hmax
              val chgt = (h * c.vs + vmax - 1) / vmax
              val nbx = (cw + 7) / 8
              val nby = (chgt + 7) / 8
              val dc = if (ss == 0 && ah == 0) hDC.getOrElse(c.dcId, return None) else null
              val ac = if (ss > 0) hAC.getOrElse(c.acId, return None) else null
              var mcu = 0
              var by = 0
              while (by < nby) {
                var bx = 0
                while (bx < nbx) {
                  if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                    br.restart(); c.pred = 0; ph.eobrun = 0
                  }
                  val off = (by * c.bw + bx) * 64
                  if (ss == 0) ph.dcBlock(c, off, dc)
                  else if (ah == 0) ph.acFirstBlock(c, off, ac)
                  else ph.acRefineBlock(c, off, ac)
                  mcu += 1
                  bx += 1
                }
                by += 1
              }
            }
            scansDone += 1
            jump = br.pos // resume marker parsing after the entropy data

          case 0xda => // SOS — baseline entropy data follows
            if (w <= 0 || h <= 0 || comps == null) return None
            // cap BEFORE allocation: dims are untrusted and the output
            // is w·h·channels bytes plus same-order component planes
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None // one interleaved scan
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcId = (b(j + 1) & 0xff) >> 4
              c.acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            comps.foreach { c =>
              c.pw = mcusX * c.hs * 8
              c.plane = new Array[Byte](c.pw * mcusY * c.vs * 8)
            }
            val br = new BitReader(b, i + 2 + len)
            var mcu = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  br.restart(); comps.foreach(_.pred = 0)
                }
                var ci = 0
                while (ci < comps.length) {
                  val c = comps(ci)
                  val q = qt.getOrElse(c.tq, return None)
                  val dc = hDC.getOrElse(c.dcId, return None)
                  val ac = hAC.getOrElse(c.acId, return None)
                  var v2 = 0
                  while (v2 < c.vs) {
                    var h2 = 0
                    while (h2 < c.hs) {
                      val coef = new Array[Double](64)
                      // DC
                      val s = dc.decode(br)
                      if (s > 11) throw new IllegalArgumentException("bad DC size")
                      c.pred += extend(br.receive(s), s)
                      coef(0) = c.pred.toDouble * q(0)
                      // AC
                      var k = 1
                      while (k < 64) {
                        val rs = ac.decode(br)
                        val r = rs >> 4; val sz = rs & 0x0f
                        if (sz == 0) {
                          if (r == 15) k += 16 // ZRL
                          else k = 64          // EOB
                        } else {
                          k += r
                          if (k > 63) throw new IllegalArgumentException("AC overrun")
                          coef(Zigzag(k)) = extend(br.receive(sz), sz).toDouble * q(k)
                          k += 1
                        }
                      }
                      val px = idct(coef)
                      val ox0 = (mx * c.hs + h2) * 8
                      val oy0 = (my * c.vs + v2) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          val v = math.round(px(yy * 8 + xx) + 128.0).toInt
                          c.plane((oy0 + yy) * c.pw + ox0 + xx) =
                            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                          xx += 1
                        }
                        yy += 1
                      }
                      h2 += 1
                    }
                    v2 += 1
                  }
                  ci += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
            return emitImage(comps, w, h, hmax, vmax, adobeTransform)
          case _ => () // APPn / COM / anything else: skip
        }
        i = if (jump >= 0) jump else i + 2 + len
      }
    }
    None // no SOS reached
  } catch { case _: Exception => None }

  // ---- DC-only encoder ------------------------------------------------

  /** T.81 Annex K.3.3.1 luminance DC table. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  /** T.81 Annex K.3.3.2 luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol from a canonical (bits, vals) pair. */
  private def codesOf(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }
  private lazy val dcCodes = codesOf(DcBits, DcVals)
  private lazy val acCodes = codesOf(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = if (n > 0) put(0xff, 8 - n)
  }

  /** Flat quant table — DC step 16 makes even constants lossless. */
  val QuantStep = 16

  /** Encode a REAL baseline grayscale JPEG whose pixels are constant
    * per 8×8 tile: tile (bx, by) carries `v(bx, by)`. `w`/`h` must be
    * multiples of 8. Even tile values reconstruct exactly (see object
    * scaladoc); odd values round to the nearest even. */
  def encodeDcOnlyGray(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, 8-bit
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc0); u16(11) // SOF0
    b(8); u16(h); u16(w); b(1) // precision, dims, 1 component
    b(1); b(0x11); b(0)        // comp id 1, 1x1 sampling, qtable 0
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00) // DHT DC class 0 id 0
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10) // DHT AC class 1 id 0
    AcBits.foreach(b); AcVals.foreach(b)
    b(0xff); b(0xda); u16(8) // SOS
    b(1); b(1); b(0x00)      // 1 comp; comp 1 uses DC 0 / AC 0
    b(0); b(63); b(0)        // spectral selection (baseline fixed)
    val bw = new BitWriter(out)
    var pred = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8)
      pred = putDcOnlyBlock(bw, v(bx, by), pred)
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Write one DC-only block (diff-coded DC + EOB) for constant value
    * `c`; returns the new predictor. */
  private def putDcOnlyBlock(bw: BitWriter, c0: Int, pred: Int): Int = {
    val c = c0 & 0xff
    val coef = Math.round(8.0 * (c - 128) / QuantStep).toInt
    val diff = coef - pred
    val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (code, len) = dcCodes(s)
    bw.put(code, len)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    val (ebCode, ebLen) = acCodes(0x00) // EOB
    bw.put(ebCode, ebLen)
    coef
  }

  /** Encode a REAL PROGRESSIVE (SOF2) grayscale JPEG of per-8×8-tile
    * constants — the [[encodeDcOnlyGray]] exact-reconstruction
    * contract transmitted progressively. Scans: (1) DC first scan
    * (with successive-approximation point transform Al=1 when
    * `split`), (2) when `split`, a DC refinement scan carrying each
    * block's low bit as one raw bit, (3) an AC first scan for band
    * 1–63 that is one EOB symbol per block (all ACs are zero by
    * construction). Even tile values reconstruct BIT-EXACTLY, so the
    * progressive path gets the same deterministic formula twin as the
    * sequential one. */
  def encodeDcOnlyProgressiveGray(w: Int, h: Int, v: (Int, Int) => Int,
      split: Boolean = true): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc2); u16(11) // SOF2 progressive
    b(8); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00) // DHT DC class 0 id 0
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10) // DHT AC class 1 id 0
    AcBits.foreach(b); AcVals.foreach(b)
    val bw8 = w / 8; val bh8 = h / 8
    def coefOf(bx: Int, by: Int): Int =
      Math.round(8.0 * ((v(bx, by) & 0xff) - 128) / QuantStep).toInt
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xff); b(0xda); u16(8)
      b(1); b(1); b(0x00) // 1 comp; DC table 0 / AC table 0
      b(ss); b(se); b((ah << 4) | al)
    }
    val al0 = if (split) 1 else 0
    // scan 1: DC first, diffs of (coef >> Al)
    sos(0, 0, 0, al0)
    var bw = new BitWriter(out)
    var pred = 0
    for (by <- 0 until bh8; bx <- 0 until bw8) {
      val coded = coefOf(bx, by) >> al0 // point transform (arithmetic)
      val diff = coded - pred
      pred = coded
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    bw.flushWithOnes()
    if (split) { // scan 2: DC refinement — each block's low bit, raw
      sos(0, 0, 1, 0)
      bw = new BitWriter(out)
      for (by <- 0 until bh8; bx <- 0 until bw8)
        bw.put(coefOf(bx, by) & 1, 1)
      bw.flushWithOnes()
    }
    // scan 3: AC band 1–63 — all zero, one EOB per block
    sos(1, 63, 0, 0)
    bw = new BitWriter(out)
    val (ebCode, ebLen) = acCodes(0x00)
    for (_ <- 0 until bw8 * bh8) bw.put(ebCode, ebLen)
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a REAL baseline YCbCr COLOR JPEG whose component planes
    * are constant per block — the color extension of
    * [[encodeDcOnlyGray]]'s exact-reconstruction contract (even
    * values survive bit-exactly; see object scaladoc).
    *
    * `subsample` = 444: all components 1×1; one Y + Cb + Cr block per
    * 8×8 MCU; `yv`/`cbv`/`crv` are per-8×8-tile `(bx, by)` constants;
    * `w`/`h` multiples of 8.
    *
    * `subsample` = 422: Y at 2×1, chroma 1×1; each 16×8 MCU carries
    * two Y blocks side by side + one Cb + one Cr; `yv` per-8×8-tile,
    * `cbv`/`crv` per-MCU `(mx, my)` constants; `w` multiple of 16,
    * `h` multiple of 8.
    *
    * `subsample` = 420: Y at 2×2, chroma 1×1; each 16×16 MCU carries
    * four Y blocks + one Cb + one Cr; `yv` stays per-8×8-tile
    * `(bx, by)`, `cbv`/`crv` are per-MCU `(mx, my)` constants (chroma
    * constant per MCU is exactly what sample-replication upsampling
    * reconstructs losslessly); `w`/`h` multiples of 16.
    *
    * (r9) `subsample` = 411 (Y 4×1, 32×8 MCUs), 311 (Y 3×1, 24×8
    * MCUs) and 114 (Y 1×4, 8×32 MCUs) carry the spec's factor-3/4
    * range under the same contract: `yv` per-8×8-tile, chroma
    * per-MCU, `w`/`h` multiples of the MCU dims. */
  def encodeDcOnlyColor(w: Int, h: Int, subsample: Int,
      yv: (Int, Int) => Int, cbv: (Int, Int) => Int,
      crv: (Int, Int) => Int): Array[Byte] = {
    // Y-component sampling factors per mode; chroma is always 1×1
    val (yh, yvs) = subsample match {
      case 444 => (1, 1)
      case 422 => (2, 1)
      case 420 => (2, 2)
      case 411 => (4, 1)
      case 311 => (3, 1)
      case 114 => (1, 4)
      case _ => throw new IllegalArgumentException(
        "subsample must be 444, 422, 420, 411, 311 or 114")
    }
    require(w % (8 * yh) == 0 && h % (8 * yvs) == 0,
      s"$subsample tile encoder needs ${8 * yh}x${8 * yvs}-multiple dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, 8-bit, shared by all comps
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc0); u16(17) // SOF0: 3 components
    b(8); u16(h); u16(w); b(3)
    b(1); b((yh << 4) | yvs); b(0) // Y
    b(2); b(0x11); b(0)            // Cb
    b(3); b(0x11); b(0)            // Cr
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00) // DHT DC class 0 id 0
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10) // DHT AC class 1 id 0
    AcBits.foreach(b); AcVals.foreach(b)
    b(0xff); b(0xda); u16(12) // SOS: 3 components
    b(3); b(1); b(0x00); b(2); b(0x00); b(3); b(0x00)
    b(0); b(63); b(0) // spectral selection (baseline fixed)
    val bw = new BitWriter(out)
    val mcuW = 8 * yh
    val mcuH = 8 * yvs
    var predY = 0; var predCb = 0; var predCr = 0
    for (my <- 0 until h / mcuH; mx <- 0 until w / mcuW) {
      // T.81 interleave order: Y blocks left-to-right, top-to-bottom
      for (v2 <- 0 until yvs; h2 <- 0 until yh)
        predY = putDcOnlyBlock(bw, yv(yh * mx + h2, yvs * my + v2), predY)
      predCb = putDcOnlyBlock(bw, cbv(mx, my), predCb)
      predCr = putDcOnlyBlock(bw, crv(mx, my), predCr)
    }
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Test hook: run a raw (context, bit) decision stream through the
    * QM encoder, then decode it back over fresh contexts — true iff
    * every decision round-trips. The image goldens pin the coder's
    * conventions against libjpeg; this probe drives the carry /
    * stacked-FF / termination edge paths with arbitrary streams. */
  private[graft] def qmRoundTripProbe(syms: Array[(Int, Int)]): Boolean = {
    val nCtx = syms.map(_._1).max + 1
    val enc = new JpegArith.Encoder
    val est = new Array[Byte](nCtx)
    syms.foreach { case (c, v) => enc.encode(est, c, v) }
    val stream = enc.finish() ++ Array(0xff.toByte, 0xd9.toByte)
    val dec = new JpegArith.Decoder(stream, 0)
    val dst = new Array[Byte](nCtx)
    syms.forall { case (c, v) => dec.decode(dst, c) == v }
  }

  /** Encode a REAL arithmetic-coded (SOF9) grayscale JPEG of
    * per-8×8-tile constants — [[encodeDcOnlyGray]]'s
    * exact-reconstruction contract carried by the T.81 Annex D QM
    * coder instead of Huffman ([[JpegArith.Encoder]], byte-exact
    * against libjpeg's arithmetic output on the golden fixtures).
    * No DAC marker: the standard's conditioning defaults apply
    * (L=0, U=1, Kx=5), which is also what the decoder assumes when
    * the marker is absent. Even tile values reconstruct
    * BIT-EXACTLY — the q90 gate device. */
  def encodeDcOnlyArithGray(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc9); u16(11) // SOF9: sequential, arithmetic
    b(8); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xff); b(0xda); u16(8) // SOS
    b(1); b(1); b(0x00)
    b(0); b(63); b(0)
    val enc = new JpegArith.Encoder
    val dc = new Array[Byte](64)
    val ac = new Array[Byte](256)
    var last = 0
    var ctx = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val coefv = Math.round(8.0 * ((v(bx, by) & 0xff) - 128) / QuantStep).toInt
      ctx = arithPutDcDiff(enc, dc, ctx, coefv - last)
      last = coefv
      enc.encode(ac, 0, 1) // EOB: no AC coefficients in a constant tile
    }
    out.write(enc.finish())
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a REAL baseline 4-component Adobe JPEG (APP14 carries
    * `transform`: 0 = stored inverted CMYK, 2 = YCCK) of per-8×8-tile
    * STORED-plane constants — the CMYK extension of the
    * exact-reconstruction contract (even values survive bit-exactly).
    * All components 1×1; `w`/`h` multiples of 8; the four `(bx, by)`
    * functions supply the stored byte for each plane — the spec/twin
    * derives expected RGB through [[decodeImage]]'s documented
    * conversion, so what's under test is the decode, not the
    * generator. */
  def encodeDcOnlyCmyk(w: Int, h: Int, transform: Int,
      p0: (Int, Int) => Int, p1: (Int, Int) => Int,
      p2: (Int, Int) => Int, p3: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    require(transform == 0 || transform == 2, "Adobe transform must be 0 or 2")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xee); u16(14) // APP14 "Adobe"
    "Adobe".foreach(c => b(c.toInt))
    u16(100); u16(0); u16(0); b(transform) // version, flags0/1, transform
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, shared by all comps
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc0); u16(20) // SOF0: 4 components
    b(8); u16(h); u16(w); b(4)
    (1 to 4).foreach { c => b(c); b(0x11); b(0) }
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00) // DHT DC class 0 id 0
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10) // DHT AC class 1 id 0
    AcBits.foreach(b); AcVals.foreach(b)
    b(0xff); b(0xda); u16(14) // SOS: 4 components
    b(4); (1 to 4).foreach { c => b(c); b(0x00) }
    b(0); b(63); b(0) // spectral selection (baseline fixed)
    val bw = new BitWriter(out)
    val preds = new Array[Int](4)
    val ps = Array(p0, p1, p2, p3)
    for (by <- 0 until h / 8; bx <- 0 until w / 8; c <- 0 until 4)
      preds(c) = putDcOnlyBlock(bw, ps(c)(bx, by), preds(c))
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  // ---- 12-bit DCT frames (SOF1/SOF2/SOF9/SOF10, precision 12) ---------
  // ---- (sequential r9; progressive + arithmetic r10) ------------------

  /** Decode a 12-BIT DCT JPEG — extended sequential (SOF1),
    * progressive (SOF2), or arithmetic-coded (SOF9 sequential /
    * SOF10 progressive), all at precision 12 — to (w, h, channels,
    * samples): channels = 1 (grayscale, w·h shorts in 0–4095) or 3
    * (w·h·3 interleaved 12-bit R'G'B' — the JFIF YCbCr conversion
    * generalized to the 2048 center: R = Y + 1.402·(Cr−2048) etc.,
    * floor(x+0.5), clamp to 0–4095). 12-bit output CANNOT be a byte
    * raster, so this is its own surface rather than a [[decodeImage]]
    * case — the high-precision analog of [[decodeGray]]'s split. T.81
    * allows 16-bit DQT entries (Pq = 1) at this precision and DC
    * categories up to 15 / AC magnitudes to 14 bits; both accepted.
    * Sampling factors 1–4, restart markers, level shift 2048, exact
    * double IDCT — the same machinery as the 8-bit path at the wider
    * range; the progressive and arithmetic scans run through the
    * SHARED [[ProgHuff]]/[[ArithScan]] procedures (r10), so the two
    * precisions cannot drift apart. Anything that is not a
    * well-formed 12-bit DCT frame (including 8-bit frames — those are
    * [[decodeImage]]'s job — and hierarchical/differential frames)
    * returns None, never a mis-decode. */
  def decode12(b: Array[Byte]): Option[(Int, Int, Int, Array[Short])] = try {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def u16(j: Int) = ((b(j) & 0xff) << 8) | (b(j + 1) & 0xff)
    val q = Array.ofDim[Int](4, 64)
    // which DQT slots a marker actually loaded: the arrays pre-zero,
    // so without this a stream referencing a missing table would
    // "decode" to a flat raster instead of refusing (the 8-bit path
    // refuses via qt.getOrElse — this is its array-shaped analog)
    val qLoaded = new Array[Boolean](4)
    val hDC = new Array[Huff](4); val hAC = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var dri = 0
    var progressive = false
    var arith = false
    var scansDone = 0
    // DAC conditioning (T.81 defaults): DC L=0/U=1, AC Kx=5 per table
    val dcCondL = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val dcCondU = scala.collection.mutable.Map[Int, Int]().withDefaultValue(1)
    val acCondK = scala.collection.mutable.Map[Int, Int]().withDefaultValue(5)

    // assemble 12-bit Short planes into the output raster: gray crop
    // for 1 component, sample-replication upsample + JFIF YCbCr→RGB
    // at the 2048 center for 3 — shared by the sequential and
    // progressive paths (the [[emitImage]] analog at depth 12)
    def emit12(planes: Array[Array[Short]], pws: Array[Int]): Option[(Int, Int, Int, Array[Short])] = {
      val hmax = comps.map(_.hs).max
      val vmax = comps.map(_.vs).max
      if (comps.length == 1) {
        val out = new Array[Short](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(planes(0), y * pws(0), out, y * w, w)
          y += 1
        }
        Some((w, h, 1, out))
      } else {
        def samp(ci2: Int, x: Int, y: Int): Int = {
          val c = comps(ci2)
          planes(ci2)((y * c.vs / vmax) * pws(ci2) + (x * c.hs / hmax)) & 0xffff
        }
        def clamp12(d: Double): Int = {
          val v = math.floor(d + 0.5).toInt
          if (v < 0) 0 else if (v > 4095) 4095 else v
        }
        val out = new Array[Short](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = samp(0, x, y)
            val pb = samp(1, x, y) - 2048
            val pr = samp(2, x, y) - 2048
            val o = (y * w + x) * 3
            out(o) = clamp12(lum + 1.402 * pr).toShort
            out(o + 1) = clamp12(lum - 0.344136 * pb - 0.714136 * pr).toShort
            out(o + 2) = clamp12(lum + 1.772 * pb).toShort
            x += 1
          }
          y += 1
        }
        Some((w, h, 3, out))
      }
    }

    // EOI-presence integrity check from stream offset `pe`: entropy
    // bits past a truncation would mis-decode into plausible garbage
    def sawEoiFrom(pe0: Int): Boolean = {
      var pe = pe0
      while (pe + 1 < b.length) {
        if ((b(pe) & 0xff) == 0xff && (b(pe + 1) & 0xff) == 0xd9) return true
        pe += 1
      }
      false
    }

    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) { // EOI
        if (!progressive || scansDone == 0) return None
        // progressive reconstruction: dequantize + de-zigzag + IDCT
        // every accumulated block at the 2048 level shift
        val planes = new Array[Array[Short]](comps.length)
        val pws = new Array[Int](comps.length)
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          if (!qLoaded(c.tq)) return None
          val qt = q(c.tq)
          pws(ci) = c.bw * 8
          planes(ci) = new Array[Short](c.bw * c.bh * 64)
          var blk = 0
          while (blk < c.bw * c.bh) {
            val off = blk * 64
            val d = new Array[Double](64)
            var zz = 0
            while (zz < 64) {
              d(Zigzag(zz)) = c.coef(off + zz).toDouble * qt(zz)
              zz += 1
            }
            val px = idct(d)
            val ox0 = (blk % c.bw) * 8
            val oy0 = (blk / c.bw) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(px(yy * 8 + xx) + 2048.0).toInt
                planes(ci)((oy0 + yy) * pws(ci) + ox0 + xx) =
                  (if (v < 0) 0 else if (v > 4095) 4095 else v).toShort
                xx += 1
              }
              yy += 1
            }
            blk += 1
          }
          ci += 1
        }
        return emit12(planes, pws)
      }
      else {
        if (i + 3 >= b.length) return None
        val len = u16(i + 2)
        val seg = i + 4
        if (len < 2 || i + 2 + len > b.length) return None
        var jump = -1 // progressive scans set this past their entropy data
        m match {
          case 0xdb =>
            var j = seg
            while (j < i + 2 + len) {
              val pq = (b(j) & 0xff) >> 4; val tq = b(j) & 0x0f
              if (tq > 3 || pq > 1) return None
              qLoaded(tq) = true
              val t = q(tq)
              if (pq == 0) { var k = 0; while (k < 64) { t(k) = b(j + 1 + k) & 0xff; k += 1 }; j += 65 }
              else { var k = 0; while (k < 64) { t(k) = u16(j + 1 + 2 * k); k += 1 }; j += 129 }
            }
          case 0xc4 =>
            var j = seg
            while (j + 16 < i + 2 + len) {
              val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xff)
              val n = bits.sum
              val tc = (b(j) & 0xff) >> 4; val th = b(j) & 0x0f
              if (tc > 1 || th > 3 || n > 256) return None
              val vals = Array.tabulate(n)(k => b(j + 17 + k) & 0xff)
              val huff = new Huff(bits, vals)
              if (tc == 0) hDC(th) = huff else hAC(th) = huff
              j += 17 + n
            }
          case 0xc1 | 0xc2 | 0xc9 | 0xca =>
            // the 12-bit surface (r10): extended sequential (SOF1),
            // progressive (SOF2), and their arithmetic twins
            // (SOF9/SOF10) — the full non-hierarchical DCT matrix
            progressive = m == 0xc2 || m == 0xca
            arith = m == 0xc9 || m == 0xca
            if ((b(seg) & 0xff) != 12) return None
            h = u16(seg + 1); w = u16(seg + 3)
            val nComp = b(seg + 5) & 0xff
            if (nComp != 1 && nComp != 3) return None
            if (w <= 0 || h <= 0) return None
            comps = Array.tabulate(nComp) { k =>
              val o = seg + 6 + 3 * k
              val hv = b(o + 1) & 0xff
              new Comp(b(o) & 0xff, hv >> 4, hv & 0x0f, b(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4))
              return None
            // T.81 B.2.3 interleaved-MCU cap: a frame property for
            // sequential (its one scan is interleaved); per-SOS for
            // progressive (Ns = 1 scans are legal past the sum)
            if (!progressive && nComp > 1 && comps.map(c => c.hs * c.vs).sum > 10)
              return None
            if (nComp == 1 && (comps(0).hs != 1 || comps(0).vs != 1))
              return None
          case 0xc0 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // every other frame type has its own surface or refusal
          case 0xcc => // DAC: arithmetic conditioning per table
            var j = seg
            while (j + 1 < i + 2 + len) {
              val tc = (b(j) & 0xff) >> 4; val tb = b(j) & 0x0f
              val v = b(j + 1) & 0xff
              if (tc == 0) { dcCondL(tb) = v & 0x0f; dcCondU(tb) = v >> 4 }
              else acCondK(tb) = v
              j += 2
            }
          case 0xdd => dri = u16(seg)

          case 0xda if !progressive && !arith => // SOF1: one interleaved Huffman scan
            if (comps == null) return None
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels / 2)
              return None // Short planes: cap BEFORE allocation
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcId = (b(j + 1) & 0xff) >> 4
              c.acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            if ((b(j) & 0xff) != 0 || (b(j + 1) & 0xff) != 63 || (b(j + 2) & 0xff) != 0)
              return None // sequential scans are full-band, no point transform
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            // 12-bit planes: Short, one per component (Comp.plane is
            // the 8-bit path's byte raster — unused here)
            val planes = new Array[Array[Short]](comps.length)
            val pws = new Array[Int](comps.length)
            var ci = 0
            while (ci < comps.length) {
              val c = comps(ci)
              pws(ci) = mcusX * c.hs * 8
              planes(ci) = new Array[Short](pws(ci) * mcusY * c.vs * 8)
              ci += 1
            }
            val br = new BitReader(b, j + 3)
            val coef = new Array[Double](64)
            var mcu = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  br.restart()
                  comps.foreach(_.pred = 0)
                }
                ci = 0
                while (ci < comps.length) {
                  val c = comps(ci)
                  if (hDC(c.dcId) == null || hAC(c.acId) == null) return None
                  if (!qLoaded(c.tq)) return None // referenced DQT never arrived
                  val qt = q(c.tq)
                  var v2 = 0
                  while (v2 < c.vs) {
                    var h2 = 0
                    while (h2 < c.hs) {
                      java.util.Arrays.fill(coef, 0.0)
                      val s = hDC(c.dcId).decode(br)
                      if (s > 15) return None // 12-bit DC categories are 0-15
                      c.pred += extend(br.receive(s), s)
                      coef(0) = c.pred.toDouble * qt(0)
                      var k = 1
                      while (k < 64) {
                        val rs = hAC(c.acId).decode(br)
                        val r = rs >> 4; val sz = rs & 0x0f
                        if (sz == 0) {
                          if (r == 15) k += 16 else k = 64 // ZRL / EOB
                        } else {
                          k += r
                          if (k > 63) return None
                          coef(Zigzag(k)) = extend(br.receive(sz), sz).toDouble * qt(k)
                          k += 1
                        }
                      }
                      val px = idct(coef)
                      val ox0 = (mx * c.hs + h2) * 8
                      val oy0 = (my * c.vs + v2) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          val v = math.round(px(yy * 8 + xx) + 2048.0).toInt
                          planes(ci)((oy0 + yy) * pws(ci) + ox0 + xx) =
                            (if (v < 0) 0 else if (v > 4095) 4095 else v).toShort
                          xx += 1
                        }
                        yy += 1
                      }
                      h2 += 1
                    }
                    v2 += 1
                  }
                  ci += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
            if (!sawEoiFrom(br.pos)) return None
            return emit12(planes, pws)

          case 0xda if !progressive && arith => // SOF9: one interleaved arithmetic scan
            if (comps == null) return None
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels / 2)
              return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcId = (b(j + 1) & 0xff) >> 4
              c.acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            val planes = new Array[Array[Short]](comps.length)
            val pws = new Array[Int](comps.length)
            var ci = 0
            while (ci < comps.length) {
              val c = comps(ci)
              pws(ci) = mcusX * c.hs * 8
              planes(ci) = new Array[Short](pws(ci) * mcusY * c.vs * 8)
              ci += 1
            }
            val as = new ArithScan(b, i + 2 + len,
              comps.map(_.dcId).toSeq, comps.map(_.acId).toSeq, comps.length,
              dcCondL, dcCondU, acCondK)
            var mcu = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  if (!as.restartReinit()) return None
                }
                ci = 0
                while (ci < comps.length) {
                  val c = comps(ci)
                  if (!qLoaded(c.tq)) return None
                  val qt = q(c.tq)
                  var v2 = 0
                  while (v2 < c.vs) {
                    var h2 = 0
                    while (h2 < c.hs) {
                      val zz = new Array[Int](64)
                      zz(0) = as.decodeDc(ci, c.dcId)
                      as.acFirst(c.acId, zz, 0, 1, 63, 0)
                      val coef = new Array[Double](64)
                      var k = 0
                      while (k < 64) {
                        coef(Zigzag(k)) = zz(k).toDouble * qt(k)
                        k += 1
                      }
                      val px = idct(coef)
                      val ox0 = (mx * c.hs + h2) * 8
                      val oy0 = (my * c.vs + v2) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          val v = math.round(px(yy * 8 + xx) + 2048.0).toInt
                          planes(ci)((oy0 + yy) * pws(ci) + ox0 + xx) =
                            (if (v < 0) 0 else if (v > 4095) 4095 else v).toShort
                          xx += 1
                        }
                        yy += 1
                      }
                      h2 += 1
                    }
                    v2 += 1
                  }
                  ci += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
            if (as.dec.hitEnd) return None
            if (!sawEoiFrom(as.dec.pos)) return None
            return emit12(planes, pws)

          case 0xda => // progressive scan (SOF2 Huffman / SOF10 arithmetic): accumulate
            if (comps == null) return None
            // tighter cap: the cross-scan coefficient accumulator
            // holds 4 bytes per sample per component
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * comps.length > Multimodal.PixelCodec.MaxPixels / 4)
              return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length) return None
            val hmax = comps.map(_.hs).max
            val vmax = comps.map(_.vs).max
            val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            if (comps(0).coef == null) comps.foreach { c =>
              c.bw = mcusX * c.hs
              c.bh = mcusY * c.vs
              c.coef = new Array[Int](c.bw * c.bh * 64)
            }
            val scanComps = new Array[Comp](ns)
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              scanComps(si) = comps.find(_.id == cid).getOrElse(return None)
              scanComps(si).dcId = (b(j + 1) & 0xff) >> 4
              scanComps(si).acId = b(j + 1) & 0x0f
              j += 2; si += 1
            }
            // B.2.3 where it applies: only an INTERLEAVED scan is
            // MCU-capped at 10 data units
            if (ns > 1 && scanComps.map(c => c.hs * c.vs).sum > 10) return None
            val ss = b(j) & 0xff
            val se = b(j + 1) & 0xff
            val ah = (b(j + 2) & 0xff) >> 4
            val al = b(j + 2) & 0x0f
            if (ss > se || se > 63 || al > 13 || ah > 14) return None
            if (ss == 0 && se != 0) return None // DC scans are band [0,0]
            if (ss > 0 && ns != 1) return None  // AC scans: one component
            if (ah != 0 && ah != al + 1) return None // successive approx steps by 1 bit

            if (!arith) { // SOF2: Huffman scans via the shared ProgHuff
              val br = new BitReader(b, i + 2 + len)
              scanComps.foreach(_.pred = 0)
              // 12-bit DC cap 15 (Table F.6) — the one knob vs 8-bit
              val ph = new ProgHuff(br, ss, se, ah, al, 15)
              if (ns > 1) { // interleaved scan (DC band only, per above)
                val dcs: Array[Huff] =
                  if (ah == 0) {
                    val arr = new Array[Huff](ns)
                    var k2 = 0
                    while (k2 < ns) {
                      arr(k2) = hDC(scanComps(k2).dcId)
                      if (arr(k2) == null) return None
                      k2 += 1
                    }
                    arr
                  } else new Array[Huff](ns) // refinement reads raw bits
                var mcu = 0
                var my = 0
                while (my < mcusY) {
                  var mx = 0
                  while (mx < mcusX) {
                    if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                      br.restart(); scanComps.foreach(_.pred = 0); ph.eobrun = 0
                    }
                    var ci = 0
                    while (ci < ns) {
                      val c = scanComps(ci)
                      var v2 = 0
                      while (v2 < c.vs) {
                        var h2 = 0
                        while (h2 < c.hs) {
                          val blk = (my * c.vs + v2) * c.bw + mx * c.hs + h2
                          ph.dcBlock(c, blk * 64, dcs(ci))
                          h2 += 1
                        }
                        v2 += 1
                      }
                      ci += 1
                    }
                    mcu += 1
                    mx += 1
                  }
                  my += 1
                }
              } else { // non-interleaved: the component's own block grid
                val c = scanComps(0)
                val cw = (w * c.hs + hmax - 1) / hmax
                val chgt = (h * c.vs + vmax - 1) / vmax
                val nbx = (cw + 7) / 8
                val nby = (chgt + 7) / 8
                val dc = if (ss == 0 && ah == 0) {
                  val t = hDC(c.dcId); if (t == null) return None; t
                } else null
                val ac = if (ss > 0) {
                  val t = hAC(c.acId); if (t == null) return None; t
                } else null
                var mcu = 0
                var by = 0
                while (by < nby) {
                  var bx = 0
                  while (bx < nbx) {
                    if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                      br.restart(); c.pred = 0; ph.eobrun = 0
                    }
                    val off = (by * c.bw + bx) * 64
                    if (ss == 0) ph.dcBlock(c, off, dc)
                    else if (ah == 0) ph.acFirstBlock(c, off, ac)
                    else ph.acRefineBlock(c, off, ac)
                    mcu += 1
                    bx += 1
                  }
                  by += 1
                }
              }
              scansDone += 1
              jump = br.pos // resume marker parsing after the entropy data
            } else { // SOF10: arithmetic scans via the shared ArithScan
              val as = new ArithScan(b, i + 2 + len,
                scanComps.map(_.dcId).toSeq, scanComps.map(_.acId).toSeq, ns,
                dcCondL, dcCondU, acCondK)
              def dcBlock(csi: Int, c: Comp, off: Int): Unit =
                if (ah == 0) c.coef(off) = as.decodeDc(csi, c.dcId) << al
                else { if (as.dcRefineBit() != 0) c.coef(off) |= (1 << al) }
              if (ss == 0) { // DC scan
                var mcu = 0
                if (ns == comps.length) { // interleaved over the MCU grid
                  var my = 0
                  while (my < mcusY) {
                    var mx = 0
                    while (mx < mcusX) {
                      if (dri > 0 && mcu > 0 && mcu % dri == 0 && !as.restartReinit()) return None
                      var csi = 0
                      while (csi < ns) {
                        val c = scanComps(csi)
                        var v2 = 0
                        while (v2 < c.vs) {
                          var h2 = 0
                          while (h2 < c.hs) {
                            dcBlock(csi, c,
                              ((my * c.vs + v2) * c.bw + mx * c.hs + h2) * 64)
                            h2 += 1
                          }
                          v2 += 1
                        }
                        csi += 1
                      }
                      mcu += 1
                      mx += 1
                    }
                    my += 1
                  }
                } else { // single component: its own block grid
                  val c = scanComps(0)
                  var blk = 0
                  while (blk < c.bw * c.bh) {
                    if (dri > 0 && blk > 0 && blk % dri == 0 && !as.restartReinit()) return None
                    dcBlock(0, c, blk * 64)
                    blk += 1
                  }
                }
              } else { // AC scan: one component, its own block grid
                val c = scanComps(0)
                var blk = 0
                while (blk < c.bw * c.bh) {
                  if (dri > 0 && blk > 0 && blk % dri == 0 && !as.restartReinit()) return None
                  val off = blk * 64
                  if (ah == 0) as.acFirst(c.acId, c.coef, off, ss, se, al)
                  else as.acRefine(c.acId, c.coef, off, ss, se, al)
                  blk += 1
                }
              }
              if (as.dec.hitEnd) return None
              scansDone += 1
              // resume at the next real marker (FF00 data and RSTn
              // inside the entropy have been consumed/handled)
              var pe = as.dec.pos
              while (pe + 1 < b.length &&
                !((b(pe) & 0xff) == 0xff && (b(pe + 1) & 0xff) != 0 &&
                  !((b(pe + 1) & 0xff) >= 0xd0 && (b(pe + 1) & 0xff) <= 0xd7)))
                pe += 1
              jump = pe
            }

          case _ => // APPn / COM / everything else skipped
        }
        i = if (jump >= 0) jump else i + 2 + len
      }
    }
    None
  } catch { case _: Throwable => None }

  /** 12-bit twin of [[encodeDcOnlyGray]]: SOF1 precision 12, flat
    * quant 16, per-8×8-tile constants in 0–4094. DC = 8·(c−2048)/16 =
    * (c−2048)/2 is integral for EVEN c, so even tiles reconstruct
    * BIT-EXACTLY — the same gate device at the wider range. DC diffs
    * stay within category 11, so the standard Annex K tables serve
    * unchanged (a 12-bit DECODER must accept categories to 15; an
    * encoder may emit any subset). */
  def encodeDcOnlyGray12(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, Pq=0 (legal at 12-bit)
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc1); u16(11) // SOF1 extended sequential
    b(12); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00)
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10)
    AcBits.foreach(b); AcVals.foreach(b)
    b(0xff); b(0xda); u16(8)
    b(1); b(1); b(0x00)
    b(0); b(63); b(0)
    val bw = new BitWriter(out)
    var pred = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val c = v(bx, by) & 0xfff
      val coefv = Math.round(8.0 * (c - 2048) / QuantStep).toInt
      val diff = coefv - pred
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      val (ebCode, ebLen) = acCodes(0x00)
      bw.put(ebCode, ebLen)
      pred = coefv
    }
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Encode one DC difference through the QM coder (T.81 F.1.4.4.1,
    * encode direction, DEFAULT conditioning L=0/U=1 — no DAC marker
    * written by any of these encoders); returns the conditioning
    * context for the next block. Shared by the sequential and
    * progressive arithmetic tile encoders at both precisions. */
  private def arithPutDcDiff(enc: JpegArith.Encoder, dc: Array[Byte],
      ctx: Int, diff: Int): Int =
    if (diff == 0) { enc.encode(dc, ctx, 0); 0 }
    else {
      enc.encode(dc, ctx, 1)
      val sign = if (diff < 0) 1 else 0
      enc.encode(dc, ctx + 1, sign)
      val m = math.abs(diff) - 1
      var sti = ctx + 2 + sign
      if (m == 0) enc.encode(dc, sti, 0)
      else {
        enc.encode(dc, sti, 1)
        val msb = Integer.highestOneBit(m)
        sti = 20 // X1
        var bb = 1
        while (bb < msb) { enc.encode(dc, sti, 1); sti += 1; bb <<= 1 }
        enc.encode(dc, sti, 0)
        sti += 14
        bb = msb
        while (bb > 1) {
          bb >>= 1
          enc.encode(dc, sti, if ((m & bb) != 0) 1 else 0)
        }
      }
      val msb = if (m == 0) 0 else Integer.highestOneBit(m)
      if (msb > 1) 12 + sign * 4 else 4 + sign * 4 // U=1 default
    }

  /** 12-bit PROGRESSIVE twin of [[encodeDcOnlyProgressiveGray]]:
    * SOF2 precision 12, flat quant 16, per-8×8-tile constants in
    * 0–4094. Scans: DC first (Al=1 when `split`), DC refinement (the
    * low bit, raw), and one all-EOB AC scan — after the final scan
    * every even tile reconstructs BIT-EXACTLY (DC = (c−2048)/2
    * integral), the q93 gate device through the successive-
    * approximation path. */
  def encodeDcOnlyProgressiveGray12(w: Int, h: Int, v: (Int, Int) => Int,
      split: Boolean = true): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, Pq=0 (legal at 12-bit)
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc2); u16(11) // SOF2 progressive, precision 12
    b(12); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00) // DHT DC class 0 id 0
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10) // DHT AC class 1 id 0
    AcBits.foreach(b); AcVals.foreach(b)
    val bw8 = w / 8; val bh8 = h / 8
    def coefOf(bx: Int, by: Int): Int =
      Math.round(8.0 * ((v(bx, by) & 0xfff) - 2048) / QuantStep).toInt
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xff); b(0xda); u16(8)
      b(1); b(1); b(0x00) // 1 comp; DC table 0 / AC table 0
      b(ss); b(se); b((ah << 4) | al)
    }
    val al0 = if (split) 1 else 0
    // scan 1: DC first, diffs of (coef >> Al)
    sos(0, 0, 0, al0)
    var bw = new BitWriter(out)
    var pred = 0
    for (by <- 0 until bh8; bx <- 0 until bw8) {
      val coded = coefOf(bx, by) >> al0 // point transform (arithmetic)
      val diff = coded - pred
      pred = coded
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    bw.flushWithOnes()
    if (split) { // scan 2: DC refinement — each block's low bit, raw
      sos(0, 0, 1, 0)
      bw = new BitWriter(out)
      for (by <- 0 until bh8; bx <- 0 until bw8)
        bw.put(coefOf(bx, by) & 1, 1)
      bw.flushWithOnes()
    }
    // scan 3: AC band 1–63 — all zero, one EOB per block
    sos(1, 63, 0, 0)
    bw = new BitWriter(out)
    val (ebCode, ebLen) = acCodes(0x00)
    for (_ <- 0 until bw8 * bh8) bw.put(ebCode, ebLen)
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** 12-bit ARITHMETIC twin of [[encodeDcOnlyArithGray]]: SOF9
    * precision 12, the QM coder carrying the same even-tile
    * exact-reconstruction contract at the 2048 center. No DAC marker
    * (default conditioning). */
  def encodeDcOnlyArithGray12(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc9); u16(11) // SOF9: sequential, arithmetic, precision 12
    b(12); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    b(0xff); b(0xda); u16(8) // SOS
    b(1); b(1); b(0x00)
    b(0); b(63); b(0)
    val enc = new JpegArith.Encoder
    val dc = new Array[Byte](64)
    val ac = new Array[Byte](256)
    var last = 0
    var ctx = 0
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val coefv = Math.round(8.0 * ((v(bx, by) & 0xfff) - 2048) / QuantStep).toInt
      ctx = arithPutDcDiff(enc, dc, ctx, coefv - last)
      last = coefv
      enc.encode(ac, 0, 1) // EOB: no AC coefficients in a constant tile
    }
    out.write(enc.finish())
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** 12-bit PROGRESSIVE-ARITHMETIC tile encoder (SOF10): the
    * [[encodeDcOnlyProgressiveGray12]] scan script carried by the QM
    * coder — DC first (Al=1 when `split`, diffs of coef>>1), DC
    * refinement (one fixed-bin bit per block), one all-EOB AC scan.
    * Each scan is its own arithmetic codeword: statistics, registers
    * and DC prediction reset per SOS (T.81 G.1.x), which is exactly
    * what [[ArithScan]]'s per-scan construction assumes. Even tiles
    * reconstruct BIT-EXACTLY after the final scan. */
  def encodeDcOnlyProgressiveArithGray12(w: Int, h: Int, v: (Int, Int) => Int,
      split: Boolean = true): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xca); u16(11) // SOF10: progressive, arithmetic, precision 12
    b(12); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    val bw8 = w / 8; val bh8 = h / 8
    def coefOf(bx: Int, by: Int): Int =
      Math.round(8.0 * ((v(bx, by) & 0xfff) - 2048) / QuantStep).toInt
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xff); b(0xda); u16(8)
      b(1); b(1); b(0x00)
      b(ss); b(se); b((ah << 4) | al)
    }
    val al0 = if (split) 1 else 0
    // scan 1: DC first — QM-coded diffs of (coef >> Al)
    sos(0, 0, 0, al0)
    locally {
      val enc = new JpegArith.Encoder
      val dc = new Array[Byte](64)
      var last = 0
      var ctx = 0
      for (by <- 0 until bh8; bx <- 0 until bw8) {
        val coded = coefOf(bx, by) >> al0
        ctx = arithPutDcDiff(enc, dc, ctx, coded - last)
        last = coded
      }
      out.write(enc.finish())
    }
    if (split) { // scan 2: DC refinement — one fixed-bin bit per block
      sos(0, 0, 1, 0)
      val enc = new JpegArith.Encoder
      val fb = JpegArith.newFixedBin()
      for (by <- 0 until bh8; bx <- 0 until bw8)
        enc.encode(fb, 0, coefOf(bx, by) & 1)
      out.write(enc.finish())
    }
    // scan 3: AC band 1–63 — one EOB decision per block
    sos(1, 63, 0, 0)
    locally {
      val enc = new JpegArith.Encoder
      val ac = new Array[Byte](256)
      for (_ <- 0 until bw8 * bh8) enc.encode(ac, 0, 1)
      out.write(enc.finish())
    }
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** 12-bit COLOR twin of [[encodeDcOnlyColor]]: SOF1 precision 12,
    * `subsample` 444 (1×1 comps, per-8×8-tile chroma) or 420 (Y 2×2,
    * chroma per 16×16 MCU — what sample replication reconstructs
    * exactly), per-tile EVEN Y'CbCr constants in 0–4094 (DC =
    * (c−2048)/2 integral → bit-exact stored planes), so
    * [[decode12]]'s 12-bit JFIF conversion (2048 center,
    * floor(x+0.5), clamp 0–4095) is a deterministic formula of exact
    * inputs — the q61 gate device at the wider range, 420 driving
    * the 12-bit path's generic interleaved-MCU loop. */
  def encodeDcOnlyColor12(w: Int, h: Int,
      yv: (Int, Int) => Int, cbv: (Int, Int) => Int,
      crv: (Int, Int) => Int, subsample: Int = 444): Array[Byte] = {
    require(subsample == 444 || subsample == 420, "subsample must be 444 or 420")
    val s420 = subsample == 420
    if (s420) require(w % 16 == 0 && h % 16 == 0, "4:2:0 tile encoder needs multiple-of-16 dims")
    else require(w % 8 == 0 && h % 8 == 0, "tile encoder needs multiple-of-8 dims")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xdb); u16(67); b(0) // DQT, table 0, shared
    (0 until 64).foreach(_ => b(QuantStep))
    b(0xff); b(0xc1); u16(17) // SOF1: 3 components, 12-bit
    b(12); u16(h); u16(w); b(3)
    b(1); b(if (s420) 0x22 else 0x11); b(0) // Y
    b(2); b(0x11); b(0)                     // Cb
    b(3); b(0x11); b(0)                     // Cr
    b(0xff); b(0xc4); u16(19 + DcVals.length); b(0x00)
    DcBits.foreach(b); DcVals.foreach(b)
    b(0xff); b(0xc4); u16(19 + AcVals.length); b(0x10)
    AcBits.foreach(b); AcVals.foreach(b)
    b(0xff); b(0xda); u16(12) // SOS: 3 components
    b(3); (1 to 3).foreach { c => b(c); b(0x00) }
    b(0); b(63); b(0)
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    def put(c: Int, v0: Int): Unit = {
      val v = v0 & 0xfff
      val coefv = Math.round(8.0 * (v - 2048) / QuantStep).toInt
      val diff = coefv - preds(c)
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      val (ebCode, ebLen) = acCodes(0x00)
      bw.put(ebCode, ebLen)
      preds(c) = coefv
    }
    if (s420) {
      for (my <- 0 until h / 16; mx <- 0 until w / 16) {
        // T.81 interleave order: Y blocks left-to-right, top-to-bottom
        for (v2 <- 0 until 2; h2 <- 0 until 2)
          put(0, yv(2 * mx + h2, 2 * my + v2))
        put(1, cbv(mx, my))
        put(2, crv(mx, my))
      }
    } else {
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        put(0, yv(bx, by)); put(1, cbv(bx, by)); put(2, crv(bx, by))
      }
    }
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  // ---- lossless (SOF3, T.81 Annex H) — r9 -----------------------------

  /** T.81 H.2: a lossless scan codes DIFFERENCE CATEGORIES 0–16 (16 =
    * the mod-2^16 value 32768, no extra bits) through a DC-class
    * Huffman table. The standard publishes no default table for them;
    * this canonical one (Kraft-complete under 1) extends the Annex K
    * DC shape to 17 symbols and is what [[encodeLossless]] writes. */
  private val LsBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0)
  private val LsVals = (0 to 16).toArray
  private lazy val lsCodes = codesOf(LsBits, LsVals)

  /** Decode a LOSSLESS JPEG (SOF3, T.81 Annex H) to (w, h, channels,
    * samples, precision): predictive Huffman coding, predictors 1–7
    * (SOS Ss field), point transform Pt (output samples are the
    * decoded values << Pt), precision 2–16, 1–4 components all 1×1
    * sampling interleaved in one scan (MCU = one sample per
    * component), restart markers (the first MCU of each restart
    * interval reverts to the default prediction 2^(P−Pt−1), T.81
    * H.2.1). Per H.1.2.1: sample (0,0) predicts the default; the rest
    * of row 0 predicts Ra; column 0 predicts Rb; everything else uses
    * the selected predictor. Reconstruction is mod 2^16. No quant, no
    * DCT — decode(encode(x)) == x exactly, which is this surface's
    * round-trip gate. Subsampled lossless frames (legal but
    * practically unused) and multi-scan non-interleaved layouts return
    * None — a declared boundary, never a mis-decode.
    *
    * Validation (r10): besides the encode/decode round-trip gate,
    * HAND-AUTHORED streams with hand-computed expected samples pin
    * the readings a symmetric encoder/decoder misreading would hide —
    * predictors 5/6 on odd negative (Rb−Rc)/(Ra−Rc) intermediates
    * (T.81's arithmetic right shift, i.e. floor, not truncating
    * division) and H.2.1's default-prediction scope at restarts
    * (MultimodalSpec "hand-computed T.81 goldens"). No independent
    * SOF3 codec exists in this container (libjpeg-turbo here is
    * 2.1.x — lossless landed in 3.0; the JDK reader is 6b-based), so
    * the spec text is the independent ground truth. */
  def decodeLossless(b: Array[Byte]): Option[(Int, Int, Int, Array[Int], Int)] = try {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def u16(j: Int) = ((b(j) & 0xff) << 8) | (b(j + 1) & 0xff)
    val hDC = new Array[Huff](4)
    var w = 0; var h = 0; var prec = 0
    var comps: Array[Comp] = null
    var dri = 0
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd9) return None
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        if (i + 3 >= b.length) return None
        val len = u16(i + 2)
        val seg = i + 4
        if (len < 2 || i + 2 + len > b.length) return None
        m match {
          case 0xc4 =>
            var j = seg
            while (j + 16 < i + 2 + len) {
              val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xff)
              val n = bits.sum
              val tc = (b(j) & 0xff) >> 4; val th = b(j) & 0x0f
              if (tc > 1 || th > 3 || n > 256) return None
              if (tc == 0) hDC(th) = new Huff(bits, Array.tabulate(n)(k => b(j + 17 + k) & 0xff))
              j += 17 + n
            }
          case 0xc3 => // the lossless surface
            prec = b(seg) & 0xff
            if (prec < 2 || prec > 16) return None
            h = u16(seg + 1); w = u16(seg + 3)
            val nComp = b(seg + 5) & 0xff
            if (nComp < 1 || nComp > 4) return None
            if (w <= 0 || h <= 0) return None
            comps = Array.tabulate(nComp) { k =>
              val o = seg + 6 + 3 * k
              val hv = b(o + 1) & 0xff
              new Comp(b(o) & 0xff, hv >> 4, hv & 0x0f, b(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hs != 1 || c.vs != 1))
              return None // declared boundary: subsampled lossless unused in practice
          case 0xc0 | 0xc1 | 0xc2 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None
          case 0xdd => dri = u16(seg)
          case 0xda =>
            if (comps == null) return None
            val nc = comps.length
            if (w > Multimodal.PixelCodec.MaxDim || h > Multimodal.PixelCodec.MaxDim ||
              w.toLong * h * nc > Multimodal.PixelCodec.MaxPixels / 4)
              return None // Int planes: cap BEFORE allocation
            val ns = b(seg) & 0xff
            if (ns != nc) return None // one interleaved scan (declared boundary)
            var j = seg + 1
            var si = 0
            while (si < ns) {
              val cid = b(j) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcId = (b(j + 1) & 0xff) >> 4
              j += 2; si += 1
            }
            val psv = b(j) & 0xff       // Ss = predictor selector
            val pt = b(j + 2) & 0x0f    // Al = point transform
            if (psv < 1 || psv > 7 || (b(j + 1) & 0xff) != 0 ||
              ((b(j + 2) & 0xff) >> 4) != 0 || pt >= prec) return None
            val planes = Array.ofDim[Int](nc, w * h)
            val br = new BitReader(b, j + 3)
            val default = 1 << (prec - pt - 1)
            var firstInInterval = true
            var mcu = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  br.restart()
                  firstInInterval = true
                }
                var ci = 0
                while (ci < nc) {
                  val t = hDC(comps(ci).dcId)
                  if (t == null) return None
                  val s = t.decode(br)
                  if (s > 16) return None
                  val diff =
                    if (s == 0) 0
                    else if (s == 16) 32768
                    else extend(br.receive(s), s)
                  val p = planes(ci)
                  val pred =
                    if (firstInInterval) default
                    else if (y == 0) p(x - 1) // row 0 after the first: Ra
                    else if (x == 0) p((y - 1) * w) // column 0: Rb
                    else {
                      val ra = p(y * w + x - 1)
                      val rb = p((y - 1) * w + x)
                      val rc = p((y - 1) * w + x - 1)
                      psv match {
                        case 1 => ra
                        case 2 => rb
                        case 3 => rc
                        case 4 => ra + rb - rc
                        case 5 => ra + ((rb - rc) >> 1)
                        case 6 => rb + ((ra - rc) >> 1)
                        case _ => (ra + rb) >> 1
                      }
                    }
                  p(y * w + x) = (pred + diff) & 0xffff
                  ci += 1
                }
                firstInInterval = false
                mcu += 1
                x += 1
              }
              y += 1
            }
            var pe = br.pos
            var sawEoi = false
            while (pe + 1 < b.length && !sawEoi) {
              if ((b(pe) & 0xff) == 0xff && (b(pe + 1) & 0xff) == 0xd9) sawEoi = true
              pe += 1
            }
            if (!sawEoi) return None
            val out = new Array[Int](w * h * nc)
            var k = 0
            var yy = 0
            while (yy < h) {
              var xx = 0
              while (xx < w) {
                var ci = 0
                while (ci < nc) {
                  out(k) = (planes(ci)(yy * w + xx) << pt) & 0xffff
                  k += 1; ci += 1
                }
                xx += 1
              }
              yy += 1
            }
            return Some((w, h, nc, out, prec))
          case _ =>
        }
        i += 2 + len
      }
    }
    None
  } catch { case _: Throwable => None }

  /** Encode a REAL lossless JPEG (SOF3) of ARBITRARY samples — unlike
    * the DC-only lossy encoders, nothing is restricted: lossless
    * coding round-trips any raster exactly (after the point
    * transform: decode(encode(x)) reconstructs (x >> pt) << pt).
    * `sample(x, y, c)` must fit `prec` bits; `psv` 1–7; `dri` > 0
    * inserts restart markers every `dri` samples-per-component with
    * the decoder's default-prediction reset. 1–4 components
    * interleaved in one scan. This is the encoder half of the
    * round-trip gate (q92): a predictor, category, mod-2^16 or
    * restart asymmetry between the halves corrupts every sample after
    * the first wrong difference. */
  def encodeLossless(w: Int, h: Int, nc: Int, prec: Int, psv: Int,
      pt: Int, dri: Int, sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nc >= 1 && nc <= 4, "dims/components")
    require(prec >= 2 && prec <= 16 && pt < prec, "precision/point transform")
    require(psv >= 1 && psv <= 7, "predictor")
    val out = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = out.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xc4); u16(19 + LsVals.length); b(0x00) // DHT DC class 0 id 0
    LsBits.foreach(b); LsVals.foreach(b)
    b(0xff); b(0xc3); u16(8 + 3 * nc) // SOF3 lossless
    b(prec); u16(h); u16(w); b(nc)
    (1 to nc).foreach { c => b(c); b(0x11); b(0) }
    if (dri > 0) { b(0xff); b(0xdd); u16(4); u16(dri) }
    b(0xff); b(0xda); u16(6 + 2 * nc) // SOS
    b(nc); (1 to nc).foreach { c => b(c); b(0x00) }
    b(psv); b(0); b(pt)
    var bw = new BitWriter(out)
    val planes = Array.ofDim[Int](nc, w * h)
    val default = 1 << (prec - pt - 1)
    var firstInInterval = true
    var mcu = 0
    var rst = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          bw.flushWithOnes()
          b(0xff); b(0xd0 + rst)
          rst = (rst + 1) & 7
          bw = new BitWriter(out)
          firstInInterval = true
        }
        var ci = 0
        while (ci < nc) {
          val v = (sample(x, y, ci) & ((1 << prec) - 1)) >> pt
          val p = planes(ci)
          val pred =
            if (firstInInterval) default
            else if (y == 0) p(x - 1)
            else if (x == 0) p((y - 1) * w)
            else {
              val ra = p(y * w + x - 1)
              val rb = p((y - 1) * w + x)
              val rc = p((y - 1) * w + x - 1)
              psv match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          p(y * w + x) = v
          val dm = (v - pred) & 0xffff
          if (dm == 32768) {
            val (code, len) = lsCodes(16) // SSSS 16: no appended bits
            bw.put(code, len)
          } else {
            val d = if (dm >= 32768) dm - 65536 else dm
            val s = if (d == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(d))
            val (code, len) = lsCodes(s)
            bw.put(code, len)
            if (s > 0) bw.put(if (d >= 0) d else d + (1 << s) - 1, s)
          }
          ci += 1
        }
        firstInInterval = false
        mcu += 1
        x += 1
      }
      y += 1
    }
    bw.flushWithOnes()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }
}
