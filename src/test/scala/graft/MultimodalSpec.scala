package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFile, mediaEnc}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("synthetic media → decodeMeta round-trips header fields") {
    val meta = Multimodal.decodeMeta(Multimodal.syntheticMedia(docs)).collect()
    assert(meta.length === docs.count())
    meta.foreach { m =>
      assert(m.valid)
      assert(m.width === (m.doc_id % 64 + 1).toInt * 16)
      assert(m.height === (m.doc_id % 48 + 1).toInt * 16)
      if (m.media_type == "video") assert(m.n_frames === (m.doc_id % 30 + 1).toInt)
      else assert(m.n_frames === 1)
    }
  }

  test("corrupt payloads mark invalid instead of failing the stage") {
    val bad = Seq(
      MediaFile(1L, "image", Array[Byte](1, 2, 3)),            // too short
      MediaFile(2L, "image", Array.fill[Byte](32)(0)),         // wrong magic
      MediaFile(3L, "image", null),                            // null bytes
      MediaFile(4L, "image", Multimodal.FakeCodec.encode(4, "image"))
    ).toDS()
    val meta = Multimodal.decodeMeta(bad).collect().sortBy(_.doc_id)
    assert(meta.map(_.valid).toSeq === Seq(false, false, false, true))
  }

  test("frame sampling fans out only video rows, honoring stride") {
    val media = Multimodal.syntheticMedia(docs)
    val frames = Multimodal.sampleFrames(media, stride = 5)
    val byDoc = frames.collect().groupBy(_.doc_id)
    byDoc.foreach { case (id, fs) =>
      assert(id % 3 === 2) // only videos
      val expected = (0 until (id % 30 + 1).toInt by 5).size
      assert(fs.length === expected)
      assert(fs.map(_.frame_index).sorted.toSeq === (0 until (id % 30 + 1).toInt by 5).toSeq)
    }
  }

  test("FormatProbe parses real PNG/JPEG/GIF/BMP/WAV headers, incl. ImageIO cross-check") {
    import Multimodal.{FormatProbe, MiniEncoder}
    assert(FormatProbe.probe(MiniEncoder.png(640, 480)) === Some(("png", 640, 480, 0, 0)))
    assert(FormatProbe.probe(MiniEncoder.jpeg(320, 200)) === Some(("jpeg", 320, 200, 0, 0)))
    assert(FormatProbe.probe(MiniEncoder.gif(13, 7)) === Some(("gif", 13, 7, 0, 0)))
    assert(FormatProbe.probe(MiniEncoder.wav(44100, 2, 4)) === Some(("wav", 0, 0, 44100, 2)))
    // a REAL png from the JDK's own encoder parses identically — the
    // probe reads the format, not MiniEncoder's bytes specifically
    val img = new java.awt.image.BufferedImage(17, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(FormatProbe.probe(bos.toByteArray) === Some(("png", 17, 11, 0, 0)))
    val bmpBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpBos)
    assert(FormatProbe.probe(bmpBos.toByteArray) === Some(("bmp", 17, 11, 0, 0)))
    val jpgBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jpgBos)
    assert(FormatProbe.probe(jpgBos.toByteArray) === Some(("jpeg", 17, 11, 0, 0)))
    // truncation and garbage → None, never a throw
    assert(FormatProbe.probe(MiniEncoder.png(640, 480).take(6)) === None)
    assert(FormatProbe.probe(Array.fill[Byte](64)(0x41)) === None)
    assert(FormatProbe.probe(null) === None)
  }

  test("PixelCodec decodes its own PNG/BMP and ImageIO's, bit-for-bit") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v(x: Int, y: Int): Int = (x * 7 + y * 3 + 5) % 256
    // h=11 ≥ 5 rows → every scanline filter type (None/Sub/Up/Average/
    // Paeth) is exercised by the encoder's rotation and reversed here
    val Some((pw, ph, ppx)) = PixelCodec.decodePng(MiniEncoder.pngGray(17, 11, v))
    assert((pw, ph) === (17, 11))
    for (y <- 0 until 11; x <- 0 until 17)
      assert((ppx(y * 17 + x) & 0xff) === v(x, y), s"png pixel ($x,$y)")
    val Some((bw, bh, bpx)) = PixelCodec.decodeBmp(MiniEncoder.bmp24(17, 11, v))
    assert((bw, bh) === (17, 11))
    for (y <- 0 until 11; x <- 0 until 17)
      assert((bpx(y * 17 + x) & 0xff) === v(x, y), s"bmp pixel ($x,$y)")
    // cross-validation against the JDK's own codecs, both directions:
    // (a) ImageIO decodes OUR png to the same raster
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MiniEncoder.pngGray(17, 11, v)))
    for (y <- 0 until 11; x <- 0 until 17)
      assert((img.getRaster.getSample(x, y, 0)) === v(x, y), s"ImageIO png ($x,$y)")
    // (b) WE decode an ImageIO-written grayscale PNG / 24bpp BMP
    val gray = new java.awt.image.BufferedImage(9, 6, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 6; x <- 0 until 9) gray.getRaster.setSample(x, y, 0, v(x, y))
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", pngOut)
    val Some((jw, jh, jpx)) = PixelCodec.decodePng(pngOut.toByteArray)
    assert((jw, jh) === (9, 6))
    for (y <- 0 until 6; x <- 0 until 9)
      assert((jpx(y * 9 + x) & 0xff) === v(x, y), s"jdk png ($x,$y)")
    val rgb = new java.awt.image.BufferedImage(9, 6, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 6; x <- 0 until 9)
      rgb.setRGB(x, y, (v(x, y) << 16) | (v(x, y) << 8) | v(x, y))
    val bmpOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "bmp", bmpOut)
    val Some((kw, kh, kpx)) = PixelCodec.decodeBmp(bmpOut.toByteArray)
    assert((kw, kh) === (9, 6))
    for (y <- 0 until 6; x <- 0 until 9)
      assert((kpx(y * 9 + x) & 0xff) === v(x, y), s"jdk bmp ($x,$y)")
    // truncation/garbage → None, never a throw
    assert(PixelCodec.decodePng(MiniEncoder.pngGray(17, 11, v).take(40)) === None)
    assert(PixelCodec.decodeBmp(MiniEncoder.bmp24(17, 11, v).take(40)) === None)
    assert(PixelCodec.decode(Array.fill[Byte](64)(0x41)) === None)
    assert(PixelCodec.decode(null) === None)
  }

  test("16-bit PNG: high-byte downconversion, ImageIO both directions") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v16(x: Int, y: Int): Int = (x * 531 + y * 7717 + 13) % 65536
    // h≥5 → every filter type runs with the doubled byte step
    val bytes = MiniEncoder.pngGray16(13, 9, v16)
    assert(bytes(24) === 16, "bit depth in IHDR")
    val Some((dw, dh, px)) = PixelCodec.decodePng(bytes)
    assert((dw, dh) === ((13, 9)))
    for (y <- 0 until 9; x <- 0 until 13)
      assert((px(y * 13 + x) & 0xff) === (v16(x, y) >> 8), s"16-bit ($x,$y)")
    // ImageIO reads OUR 16-bit write to the full-depth samples
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 9; x <- 0 until 13)
      assert(img.getRaster.getSample(x, y, 0) === v16(x, y), s"ImageIO 16 ($x,$y)")
    // WE decode an ImageIO-written 16-bit gray PNG to its high bytes
    val gray = new java.awt.image.BufferedImage(7, 6,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 6; x <- 0 until 7) gray.getRaster.setSample(x, y, 0, v16(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", bos)
    val Some((jw, jh, jpx)) = PixelCodec.decodePng(bos.toByteArray)
    assert((jw, jh) === ((7, 6)))
    for (y <- 0 until 6; x <- 0 until 7)
      assert((jpx(y * 7 + x) & 0xff) === (v16(x, y) >> 8), s"jdk 16 ($x,$y)")
    // a LYING depth byte (16-bit stream relabeled 4-bit) is refused
    // by the byte-accounting guards, never mis-decoded (CRC is not
    // validated by contract — decode guards, not checksums)
    val bad = bytes.clone(); bad(24) = 4
    assert(PixelCodec.decodePng(bad) === None)
    // an ILLEGAL depth/type cell (sub-byte truecolor, spec §11.2.2)
    // is refused outright
    val rgbBytes = MiniEncoder.pngRgb(5, 5, (x, y) => (x, y, x + y))
    val badRgb = rgbBytes.clone(); badRgb(24) = 4
    assert(PixelCodec.decodePngImage(badRgb) === None)
  }

  test("sub-byte PNG matrix: depths 1/2/4 gray+palette × Adam7, decode + ImageIO cross-read") {
    import Multimodal.{MiniEncoder, PixelCodec}
    for {
      depth <- Seq(1, 2, 4)
      interlaced <- Seq(false, true)
      (w, h) <- Seq((13, 9), (1, 1), (2, 3), (9, 6)) // ≥5 rows rotates all filters; tiny dims hit empty/ragged passes
    } {
      val max = (1 << depth) - 1
      val factor = 255 / max
      def v(x: Int, y: Int): Int = (x * 5 + y * 3 + 1) % (max + 1)
      // gray: decode scales by bit replication (v·255/max)
      val label = s"d=$depth il=$interlaced ${w}x$h"
      val gray = MiniEncoder.pngGraySub(w, h, depth, interlaced, v)
      assert(gray(24) === depth, s"$label depth")
      val Some((gw, gh, gch, gpx)) = PixelCodec.decodePngImage(gray)
      assert((gw, gh, gch) === ((w, h, 1)), label)
      for (y <- 0 until h; x <- 0 until w)
        assert((gpx(y * w + x) & 0xff) === v(x, y) * factor, s"$label gray ($x,$y)")
      // ImageIO cross-reads OUR write at the raw sample depth
      val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gray))
      for (y <- 0 until h; x <- 0 until w)
        assert(gimg.getRaster.getSample(x, y, 0) === v(x, y), s"$label ImageIO gray ($x,$y)")
      // palette: indices expand through a PLTE of 2^depth distinct RGBs
      val plte = Array.tabulate((max + 1) * 3)(i =>
        ((i / 3) * 40 + i % 3 * 7 + 9).toByte)
      val pal = MiniEncoder.pngPaletteSub(w, h, depth, plte, interlaced, v)
      val Some((pw2, ph2, pch, ppx)) = PixelCodec.decodePngImage(pal)
      assert((pw2, ph2, pch) === ((w, h, 3)), label)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(ppx((y * w + x) * 3 + c) === plte(v(x, y) * 3 + c), s"$label pal ($x,$y,$c)")
      // ImageIO agrees on the expanded colors
      val pimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pal))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = pimg.getRGB(x, y)
        val exp = ((plte(v(x, y) * 3) & 0xff) << 16) |
          ((plte(v(x, y) * 3 + 1) & 0xff) << 8) | (plte(v(x, y) * 3 + 2) & 0xff)
        assert((rgb & 0xffffff) === exp, s"$label ImageIO pal ($x,$y)")
      }
    }
    // WE decode a JDK-written 1-bit PNG (TYPE_BYTE_BINARY), whichever
    // legal encoding (gray or 2-entry palette) the writer picks
    def bit(x: Int, y: Int): Int = (x * 3 + y * 7 + 1) % 2
    val bin = new java.awt.image.BufferedImage(11, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 7; x <- 0 until 11) bin.getRaster.setSample(x, y, 0, bit(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bin, "png", bos)
    val foreign = bos.toByteArray
    assert(foreign(24) === 1, "JDK wrote a 1-bit file")
    val Some((fw, fh, fch, fpx)) = PixelCodec.decodePngImage(foreign)
    assert((fw, fh) === ((11, 7)))
    for (y <- 0 until 7; x <- 0 until 11; c <- 0 until fch)
      assert((fpx((y * 11 + x) * fch + c) & 0xff) === bit(x, y) * 255, s"jdk 1-bit ($x,$y)")
  }

  test("16-bit PNG matrix: color types 0/2/4/6 × Adam7, decode + ImageIO cross-read") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v(x: Int, y: Int, c: Int): Int = (x * 531 + y * 7717 + c * 911 + 13) % 65536
    for {
      colorType <- Seq(0, 2, 4, 6)
      interlaced <- Seq(false, true)
      (w, h) <- Seq((13, 9), (1, 1), (2, 3)) // ≥5 rows rotates all filters; tiny dims hit empty/ragged passes
    } {
      val label = s"ct=$colorType il=$interlaced ${w}x$h"
      val bytes = MiniEncoder.png16(w, h, colorType, interlaced, v)
      assert(bytes(24) === 16, s"$label depth")
      assert(bytes(25) === colorType, s"$label colorType")
      assert(bytes(28) === (if (interlaced) 1 else 0), s"$label interlace")
      // our decode: high-byte downconversion, alpha dropped
      val Some((dw, dh, ch, px)) = PixelCodec.decodePngImage(bytes)
      val outCh = if (colorType == 0 || colorType == 4) 1 else 3
      assert((dw, dh, ch) === ((w, h, outCh)), label)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until outCh)
        assert((px((y * w + x) * outCh + c) & 0xff) === (v(x, y, c) >> 8),
          s"$label ($x,$y,$c)")
      // ImageIO cross-reads OUR write at full 16-bit depth, alpha included
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val nCh = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nCh)
        assert(img.getRaster.getSample(x, y, c) === v(x, y, c), s"$label ImageIO ($x,$y,$c)")
    }
  }

  test("Adam7 interlaced PNG: own round-trip, ImageIO both directions") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v(x: Int, y: Int): Int = (x * 13 + y * 5 + 7) % 256
    // odd dims exercise empty/ragged passes; 9x6 exercises pass skips
    for ((w, h) <- Seq((17, 11), (9, 6), (8, 8), (1, 1), (2, 3))) {
      val bytes = MiniEncoder.pngGrayInterlaced(w, h, v)
      assert(bytes(28) === 1, "interlace flag in IHDR")
      val Some((dw, dh, px)) = PixelCodec.decodePng(bytes)
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) === v(x, y), s"($w x $h) pixel ($x,$y)")
      // foreign read of OUR interlaced write
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) === v(x, y), s"ImageIO ($x,$y)")
    }
    // WE decode an ImageIO-written PROGRESSIVE (Adam7) png
    val gray = new java.awt.image.BufferedImage(13, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 7; x <- 0 until 13) gray.getRaster.setSample(x, y, 0, v(x, y))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(gray, null, null), params)
    ios.close(); writer.dispose()
    val foreign = bos.toByteArray
    assert(foreign(28) === 1, "JDK writer produced an interlaced file")
    val Some((jw, jh, jpx)) = PixelCodec.decodePng(foreign)
    assert((jw, jh) === ((13, 7)))
    for (y <- 0 until 7; x <- 0 until 13)
      assert((jpx(y * 13 + x) & 0xff) === v(x, y), s"jdk progressive ($x,$y)")
  }

  test("GIF LZW: own round-trip incl. table overflow, ImageIO both directions, interlace") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v(x: Int, y: Int): Int = (x * 7 + y * 3 + 5) % 256
    // (a) round-trip our own encoder→decoder on a small gradient
    val Some((gw, gh, gpx)) = PixelCodec.decodeGif(MiniEncoder.gifGray(17, 11, v))
    assert((gw, gh) === (17, 11))
    for (y <- 0 until 11; x <- 0 until 17)
      assert((gpx(y * 17 + x) & 0xff) === v(x, y), s"gif pixel ($x,$y)")
    // (b) a noisy 160×120 raster forces >4096 table entries → the
    // encoder's clear-code reset and the full 9→12-bit width ladder
    // are genuinely exercised, not just the literal path
    def noisy(x: Int, y: Int): Int = (x * 31 + y * 17 + x * y + 7) % 256
    val big = MiniEncoder.gifGray(160, 120, noisy)
    val Some((nw, nh, npx)) = PixelCodec.decodeGif(big)
    assert((nw, nh) === (160, 120))
    for (y <- 0 until 120; x <- 0 until 160)
      assert((npx(y * 160 + x) & 0xff) === noisy(x, y), s"noisy gif ($x,$y)")
    // (c) ImageIO decodes OUR gif to the same raster (palette is
    // gray i→(i,i,i), so any channel equals the index)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MiniEncoder.gifGray(17, 11, v)))
    for (y <- 0 until 11; x <- 0 until 17)
      assert((img.getRGB(x, y) & 0xff) === v(x, y), s"ImageIO gif ($x,$y)")
    // (d) WE decode an ImageIO-written GIF (foreign encoder): indexed
    // image with an exact gray palette so no quantization noise
    val cmap = (0 until 256).map(i => ((0xff << 24) | (i << 16) | (i << 8) | i)).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val idxImg = new java.awt.image.BufferedImage(23, 9,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 9; x <- 0 until 23) idxImg.getRaster.setSample(x, y, 0, v(x, y))
    val gifOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(idxImg, "gif", gifOut)
    val Some((jw, jh, jpx)) = PixelCodec.decodeGif(gifOut.toByteArray)
    assert((jw, jh) === (23, 9))
    for (y <- 0 until 9; x <- 0 until 23)
      assert((jpx(y * 23 + x) & 0xff) === v(x, y), s"jdk gif ($x,$y)")
    // (e) INTERLACED foreign gif: ImageIO's writer in progressive mode
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ilOut = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(ilOut)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(idxImg, null, null), param)
    ios.close(); writer.dispose()
    val il = ilOut.toByteArray
    // confirm the interlace bit is really set (walk to the image
    // descriptor: header+LSD, skip GCT, skip 0x21 extensions)
    var p = 13 + (if ((il(10) & 0x80) != 0) 3 * (2 << (il(10) & 7)) else 0)
    while ((il(p) & 0xff) == 0x21) {
      p += 2
      while ((il(p) & 0xff) != 0) p += 1 + (il(p) & 0xff)
      p += 1
    }
    assert((il(p) & 0xff) === 0x2c)
    assert((il(p + 9) & 0x40) !== 0, "ImageIO did not write interlaced")
    val Some((iw, ih, ipx)) = PixelCodec.decodeGif(il)
    assert((iw, ih) === (23, 9))
    for (y <- 0 until 9; x <- 0 until 23)
      assert((ipx(y * 23 + x) & 0xff) === v(x, y), s"interlaced gif ($x,$y)")
    // (f) truncation/garbage → None, never a throw; giant dims capped
    val own = MiniEncoder.gifGray(17, 11, v)
    assert(PixelCodec.decodeGif(own.take(6)) === None)
    assert(PixelCodec.decodeGif(own.take(40)) === None)
    assert(PixelCodec.decodeGif(own.take(own.length - 2)) === None)
    val evil = own.clone() // claim 30000×30000 in the image descriptor
    def wl16(b: Array[Byte], i: Int, value: Int): Unit = {
      b(i) = (value & 0xff).toByte; b(i + 1) = ((value >> 8) & 0xff).toByte
    }
    val desc = 13 + 768 // header+LSD, 256-entry GCT
    wl16(evil, desc + 5, 30000); wl16(evil, desc + 7, 30000)
    assert(PixelCodec.decodeGif(evil) === None)
  }

  test("WAV PCM samples: own round-trip, javax.sound both directions, chunk-walk") {
    import Multimodal.{MiniEncoder, WavCodec}
    def v(i: Int, c: Int): Int = ((i * 31 + c * 17) % 65536) - 32768
    val own = MiniEncoder.wavPcm(16000, 2, 40, v)
    val Some((rate, ch, xs)) = WavCodec.decode(own)
    assert((rate, ch, xs.length) === (16000, 2, 80))
    for (i <- 0 until 40; c <- 0 until 2)
      assert(xs(i * 2 + c).toInt === v(i, c), s"sample ($i,$c)")
    // (a) javax.sound decodes OUR wav to the same bytes
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(own))
    val fmt = ais.getFormat
    assert((fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits) === (16000, 2, 16))
    val raw = ais.readAllBytes()
    assert(raw.length === 160)
    for (j <- 0 until 80) {
      val jdkv = (((raw(2 * j + 1) & 0xff) << 8) | (raw(2 * j) & 0xff)).toShort.toInt
      assert(jdkv === xs(j).toInt, s"jdk sample $j")
    }
    // (b) WE decode a javax.sound-written wav (foreign encoder, and a
    // foreign chunk layout)
    val buf = new Array[Byte](60)
    for (j <- 0 until 30) {
      val s = v(j, 0)
      buf(2 * j) = (s & 0xff).toByte; buf(2 * j + 1) = ((s >> 8) & 0xff).toByte
    }
    val srcFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(buf), srcFmt, 30),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val Some((jr, jc, jxs)) = WavCodec.decode(out.toByteArray)
    assert((jr, jc, jxs.length) === (8000, 1, 30))
    for (j <- 0 until 30) assert(jxs(j).toInt === v(j, 0), s"foreign sample $j")
    // (c) truncation/garbage → None, never a throw
    assert(WavCodec.decode(own.take(20)) === None)
    assert(WavCodec.decode(own.take(own.length - 3)) === None)
    assert(WavCodec.decode(null) === None)
    // non-PCM format tag refused
    val nonPcm = own.clone(); nonPcm(20) = 3 // IEEE float
    assert(WavCodec.decode(nonPcm) === None)
  }

  test("animated GIF frames: full decode, ImageIO per-frame cross-check, stride stats") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def v(x: Int, y: Int, f: Int): Int = (x + y + 7 * f + 3) % 256
    val anim = MiniEncoder.gifAnimGray(10, 6, 5, v)
    val Some((w, h, frames)) = PixelCodec.decodeGifFrames(anim)
    assert((w, h, frames.length) === (10, 6, 5))
    for (f <- 0 until 5; y <- 0 until 6; x <- 0 until 10)
      assert((frames(f)(y * 10 + x) & 0xff) === v(x, y, f), s"frame $f ($x,$y)")
    // ImageIO reads the same five frames with the same pixels
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(anim)))
    assert(reader.getNumImages(true) === 5)
    for (f <- 0 until 5) {
      val img = reader.read(f)
      for (y <- 0 until 6; x <- 0 until 10)
        assert((img.getRGB(x, y) & 0xff) === v(x, y, f), s"ImageIO frame $f ($x,$y)")
    }
    reader.dispose()
    // single-frame decode = frame 0 (decodeGif stops at maxFrames=1)
    val Some((_, _, first)) = PixelCodec.decodeGif(anim)
    assert(first.sameElements(frames(0)))
    // frameStats: stride honored, stats match the rasters
    val media = Seq(Multimodal.MediaFile(3L, "video", anim)).toDS()
    val stats = Multimodal.frameStats(media, stride = 2).collect().sortBy(_.frame_index)
    assert(stats.map(_.frame_index).toSeq === Seq(0, 2, 4))
    stats.foreach { st =>
      val expected = for (y <- 0 until 6; x <- 0 until 10) yield v(x, y, st.frame_index)
      assert(st.pixel_sum === expected.map(_.toLong).sum)
      assert(st.pixel_min === expected.min && st.pixel_max === expected.max)
    }
    // truncated animation → no rows, not a throw
    assert(Multimodal.frameStats(
      Seq(Multimodal.MediaFile(4L, "video", anim.take(30))).toDS(), 1).count() === 0)
  }

  test("GIF compositing: partial rects, transparency, disposal 1/2/3, ImageIO container check") {
    import Multimodal.{MiniEncoder, PixelCodec}
    import MiniEncoder.GifFrame
    // 8×4 screen, bg index 50. Frame 0: full base 10. Frame 1: 4×2
    // rect at (2,1) of 200, disposal 2 (rect → bg afterwards).
    // Frame 2: 2×2 rect at (0,0) of 99 with transIdx 99 on half its
    // pixels (checker: transparent pixels keep the canvas), disposal 3
    // (canvas reverts afterwards). Frame 3: full-screen 30 with
    // transIdx 30 everywhere EXCEPT one pixel of 77 — shows the
    // post-disposal canvas through the transparency.
    val anim = MiniEncoder.gifAnimComposite(8, 4, 50, Seq(
      GifFrame(0, 0, 8, 4, 1, -1, (_, _) => 10),
      GifFrame(2, 1, 4, 2, 2, -1, (_, _) => 200),
      GifFrame(0, 0, 2, 2, 3, 99, (x, y) => if ((x + y) % 2 == 0) 99 else 130),
      GifFrame(0, 0, 8, 4, 1, 30, (x, y) => if ((x, y) == (5, 3)) 77 else 30)
    ))
    val Some((w, h, frames)) = PixelCodec.decodeGifFrames(anim)
    assert((w, h, frames.length) === (8, 4, 4))
    def px(f: Int, x: Int, y: Int) = frames(f)(y * 8 + x) & 0xff
    // frame 0: all base
    for (y <- 0 until 4; x <- 0 until 8) assert(px(0, x, y) === 10, s"f0 ($x,$y)")
    // frame 1: rect of 200 at (2..5, 1..2), rest still 10
    for (y <- 0 until 4; x <- 0 until 8) {
      val want = if (x >= 2 && x < 6 && y >= 1 && y < 3) 200 else 10
      assert(px(1, x, y) === want, s"f1 ($x,$y)")
    }
    // frame 2 draws AFTER frame 1's disposal-2 (its rect reverted to
    // bg gray 50): checker 130s land, checker 99s are transparent and
    // keep the canvas (10 at (0,0)-quadrant positions)
    for (y <- 0 until 4; x <- 0 until 8) {
      val afterDisposal2 = if (x >= 2 && x < 6 && y >= 1 && y < 3) 50 else 10
      val want =
        if (x < 2 && y < 2) { if ((x + y) % 2 == 0) afterDisposal2 else 130 }
        else afterDisposal2
      assert(px(2, x, y) === want, s"f2 ($x,$y)")
    }
    // frame 3 draws AFTER frame 2's disposal-3 (canvas reverted to the
    // post-frame-1-disposal state): everything transparent except 77
    for (y <- 0 until 4; x <- 0 until 8) {
      val reverted = if (x >= 2 && x < 6 && y >= 1 && y < 3) 50 else 10
      val want = if ((x, y) == (5, 3)) 77 else reverted
      assert(px(3, x, y) === want, s"f3 ($x,$y)")
    }
    // ImageIO reads OUR container: same frame count, and each frame's
    // raw rect, offsets, and disposal metadata match what we encoded —
    // the foreign-reader agreement that the encoder is conformant
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(anim)))
    assert(reader.getNumImages(true) === 4)
    val wantMeta = Seq((0, 0, 8, 4, "doNotDispose"), (2, 1, 4, 2, "restoreToBackgroundColor"),
      (0, 0, 2, 2, "restoreToPrevious"), (0, 0, 8, 4, "doNotDispose"))
    for (f <- 0 until 4) {
      val md = reader.getImageMetadata(f)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gce = md.getElementsByTagName("GraphicControlExtension").item(0)
        .asInstanceOf[org.w3c.dom.Element]
      val desc = md.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[org.w3c.dom.Element]
      val got = (desc.getAttribute("imageLeftPosition").toInt,
        desc.getAttribute("imageTopPosition").toInt,
        desc.getAttribute("imageWidth").toInt,
        desc.getAttribute("imageHeight").toInt,
        gce.getAttribute("disposalMethod"))
      assert(got === wantMeta(f), s"frame $f metadata")
    }
    // raw rect pixels: frame 1's 4×2 rect is all 200
    val img1 = reader.read(1)
    assert((img1.getWidth, img1.getHeight) === (4, 2))
    for (y <- 0 until 2; x <- 0 until 4)
      assert((img1.getRGB(x, y) & 0xff) === 200, s"ImageIO rect ($x,$y)")
    reader.dispose()
    // out-of-bounds rect refused, not mis-composited
    val oob = MiniEncoder.gifAnimComposite(8, 4, 0, Seq(
      GifFrame(0, 0, 8, 4, 1, -1, (_, _) => 10)))
    // hand-patch the descriptor's left to 6 so 6+8 > 8
    val patched = oob.clone()
    val descAt = patched.indexOfSlice(Array[Byte](0x2c, 0, 0, 0, 0))
    patched(descAt + 1) = 6
    assert(PixelCodec.decodeGifFrames(patched) === None)
    // the q62 closed form: quadrant constants through frameStats
    def quadAnim(id: Long) = {
      val n = (id % 8).toInt + 2
      val base = ((3L * id) % 256).toInt
      MiniEncoder.gifAnimComposite(16, 16, 0,
        GifFrame(0, 0, 16, 16, 1, -1, (_, _) => base) +:
          (1 to n).map { f =>
            val q = (f - 1) % 4
            GifFrame((q % 2) * 8, (q / 2) * 8, 8, 8, 1, -1,
              (_, _) => ((7L * f + id) % 256).toInt)
          })
    }
    val id = 11L
    val stats = Multimodal.frameStats(
      Seq(Multimodal.MediaFile(id, "video", quadAnim(id))).toDS(), stride = 1)
      .collect().sortBy(_.frame_index)
    assert(stats.length === (id % 8).toInt + 3)
    stats.foreach { st =>
      val fi = st.frame_index
      val vals = (0 until 4).map { q =>
        if (fi < q + 1) ((3L * id) % 256).toInt
        else ((7L * (fi - ((fi - 1 - q) % 4)) + id) % 256).toInt
      }
      assert(st.pixel_sum === vals.map(_.toLong).sum * 64, s"frame $fi sum")
      assert(st.pixel_min === vals.min && st.pixel_max === vals.max, s"frame $fi minmax")
    }
  }

  test("JPEG baseline decode: exact DC-only round-trip, ImageIO both directions ±1, refusals") {
    import Multimodal.PixelCodec
    import graft.operators.JpegCodec
    // (a) even constant tiles reconstruct BIT-EXACTLY (the q55 contract)
    def tv(bx: Int, by: Int): Int = 2 * ((bx + 3 * by + 5) % 128)
    val own = JpegCodec.encodeDcOnlyGray(32, 24, tv)
    val Some((w, h, px)) = JpegCodec.decodeGray(own)
    assert((w, h) === (32, 24))
    for (y <- 0 until 24; x <- 0 until 32)
      assert((px(y * 32 + x) & 0xff) === tv(x / 8, y / 8), s"tile pixel ($x,$y)")
    // (b) ImageIO agrees on our DC-only file (also exact: DC-only IDCT
    // is a constant in any conformant IDCT)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(own))
    for (y <- 0 until 24; x <- 0 until 32)
      assert((img.getRaster.getSample(x, y, 0)) === tv(x / 8, y / 8), s"ImageIO ($x,$y)")
    // (c) odd tile values round deterministically to the nearest
    // representable constant (round-half-up on the DC coefficient)
    val odd = JpegCodec.encodeDcOnlyGray(8, 8, (_, _) => 129)
    val Some((_, _, oddPx)) = JpegCodec.decodeGray(odd)
    assert((oddPx(0) & 0xff) === 130)
    // (d) full-AC foreign file: ImageIO WRITES a gradient (21×13 —
    // partial edge blocks), we decode it within the JPEG spec's IDCT
    // allowance (±1) of ImageIO's own decode of the same bytes
    val gray = new java.awt.image.BufferedImage(21, 13,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 13; x <- 0 until 21)
      gray.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "jpg", jout)
    val foreign = jout.toByteArray
    val Some((fw, fh, fpx)) = JpegCodec.decodeGray(foreign)
    assert((fw, fh) === (21, 13))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    var maxDiff = 0
    for (y <- 0 until 13; x <- 0 until 21) {
      val d = math.abs((fpx(y * 21 + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      if (d > maxDiff) maxDiff = d
    }
    assert(maxDiff <= 1, s"maxDiff=$maxDiff vs ImageIO")
    // (e) refusals, never throws: truncation, color frames, scanless
    // header-only files, garbage
    assert(JpegCodec.decodeGray(own.take(8)) === None)
    assert(JpegCodec.decodeGray(own.take(own.length - 3)) === None)
    assert(JpegCodec.decodeGray(Multimodal.MiniEncoder.jpeg(9, 7)) === None)
    val rgb = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val cout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", cout)
    assert(JpegCodec.decodeGray(cout.toByteArray) === None) // color refused
    assert(JpegCodec.decodeGray(null) === None)
    // (f) the dispatcher routes ffd8 to the jpeg tier
    assert(PixelCodec.decode(own).map(_._1) === Some("jpeg"))
  }

  test("JPEG color decode: 4:4:4/4:2:2/4:2:0 DC-lattice exact, ImageIO both directions, refusals") {
    import graft.operators.JpegCodec
    // the decoder's published RGB contract: JFIF double formula,
    // floor(x+0.5), clamp — the same arithmetic the q61 oracle runs
    def rgbOf(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def c(d: Double) = math.max(0, math.min(255, math.floor(d + 0.5).toInt))
      (c(yv + 1.402 * (cr - 128)),
        c(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        c(yv + 1.772 * (cb - 128)))
    }
    // (a) 4:4:4 even lattice reconstructs EXACTLY per channel
    def yv(bx: Int, by: Int) = 2 * ((bx + 3 * by + 5) % 128)
    def cbv(bx: Int, by: Int) = 2 * ((2 * bx + by + 5) % 128)
    def crv(bx: Int, by: Int) = 2 * ((bx + 2 * by + 15) % 128)
    val own444 = JpegCodec.encodeDcOnlyColor(32, 24, 444, yv, cbv, crv)
    val Some((w4, h4, 3, px4)) = JpegCodec.decodeImage(own444)
    assert((w4, h4) === (32, 24))
    for (y <- 0 until 24; x <- 0 until 32) {
      val want = rgbOf(yv(x / 8, y / 8), cbv(x / 8, y / 8), crv(x / 8, y / 8))
      val o = (y * 32 + x) * 3
      val got = (px4(o) & 0xff, px4(o + 1) & 0xff, px4(o + 2) & 0xff)
      assert(got === want, s"4:4:4 ($x,$y)")
    }
    // (b) 4:2:0: per-MCU chroma constants reconstruct EXACTLY through
    // the interleaved-MCU scan + replication upsampling
    def cb20(mx: Int, my: Int) = 2 * ((mx + 2 * my + 5) % 128)
    def cr20(mx: Int, my: Int) = 2 * ((3 * mx + my + 5) % 128)
    val own420 = JpegCodec.encodeDcOnlyColor(48, 32, 420, yv, cb20, cr20)
    val Some((w2, h2, 3, px2)) = JpegCodec.decodeImage(own420)
    assert((w2, h2) === (48, 32))
    for (y <- 0 until 32; x <- 0 until 48) {
      val want = rgbOf(yv(x / 8, y / 8), cb20(x / 16, y / 16), cr20(x / 16, y / 16))
      val o = (y * 48 + x) * 3
      val got = (px2(o) & 0xff, px2(o + 1) & 0xff, px2(o + 2) & 0xff)
      assert(got === want, s"4:2:0 ($x,$y)")
    }
    // (b2) 4:2:2: two Y blocks + chroma per 16×8 MCU, horizontal-only
    // replication — exact for per-MCU chroma constants
    def cb22(mx: Int, my: Int) = 2 * ((mx + 3 * my + 1) % 128)
    def cr22(mx: Int, my: Int) = 2 * ((2 * mx + my + 9) % 128)
    val own422 = JpegCodec.encodeDcOnlyColor(32, 16, 422, yv, cb22, cr22)
    val Some((w22, h22, 3, px22)) = JpegCodec.decodeImage(own422)
    assert((w22, h22) === (32, 16))
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = rgbOf(yv(x / 8, y / 8), cb22(x / 16, y / 8), cr22(x / 16, y / 8))
      val o = (y * 32 + x) * 3
      val got = (px22(o) & 0xff, px22(o + 1) & 0xff, px22(o + 2) & 0xff)
      assert(got === want, s"4:2:2 ($x,$y)")
    }
    // (c) ImageIO reads OUR 4:4:4 within ±1 per channel (its
    // fixed-point YCbCr→RGB vs our exact doubles)
    val img4 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(own444))
    for (y <- 0 until 24; x <- 0 until 32; c <- 0 until 3) {
      val want = rgbOf(yv(x / 8, y / 8), cbv(x / 8, y / 8), crv(x / 8, y / 8))
      val wantC = c match { case 0 => want._1; case 1 => want._2; case 2 => want._3 }
      assert(math.abs(img4.getRaster.getSample(x, y, c) - wantC) <= 1,
        s"ImageIO 4:4:4 ($x,$y,$c)")
    }
    // (d) ImageIO reads OUR 4:2:0 — GLOBALLY constant chroma so
    // libjpeg's fancy (triangle) upsampler and our replication agree
    val flat420 = JpegCodec.encodeDcOnlyColor(32, 16, 420, yv, (_, _) => 100, (_, _) => 160)
    val Some((_, _, 3, fpx)) = JpegCodec.decodeImage(flat420)
    val imgF = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(flat420))
    for (y <- 0 until 16; x <- 0 until 32; c <- 0 until 3)
      assert(math.abs(imgF.getRaster.getSample(x, y, c) - (fpx((y * 32 + x) * 3 + c) & 0xff)) <= 1,
        s"ImageIO 4:2:0 ($x,$y,$c)")
    // (e) foreign full-AC color: ImageIO WRITES a luma gradient with
    // constant chroma (R=G=B ⇒ Cb=Cr=128); we decode within ±2 of
    // ImageIO's own read-back (two lossy steps + upsampler choice on
    // near-constant chroma)
    val rgbImg = new java.awt.image.BufferedImage(21, 13,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 13; x <- 0 until 21) {
      val v = (x * 11 + y * 7) % 256
      rgbImg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val fout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbImg, "jpg", fout)
    val foreign = fout.toByteArray
    val Some((fw, fh, 3, ffpx)) = JpegCodec.decodeImage(foreign)
    assert((fw, fh) === (21, 13))
    val refImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    var maxDiff = 0
    for (y <- 0 until 13; x <- 0 until 21; c <- 0 until 3) {
      val d = math.abs((ffpx((y * 21 + x) * 3 + c) & 0xff) - refImg.getRaster.getSample(x, y, c))
      if (d > maxDiff) maxDiff = d
    }
    assert(maxDiff <= 2, s"foreign color maxDiff=$maxDiff vs ImageIO")
    // (f) contracts kept: decodeGray still refuses color; gray files
    // flow through decodeImage with channels=1; truncation refused;
    // progressive color refused, not mis-decoded
    assert(JpegCodec.decodeGray(own444) === None)
    val gray = JpegCodec.encodeDcOnlyGray(16, 8, (bx, by) => 2 * (bx + by + 9))
    assert(JpegCodec.decodeImage(gray).map(t => (t._1, t._2, t._3)) === Some((16, 8, 1)))
    assert(JpegCodec.decodeImage(own444.take(own444.length - 3)) === None)
    assert(JpegCodec.decodeImage(own444.take(8)) === None)
  }

  test("CMYK/YCCK JPEG decode: Adobe APP14 transforms, formula-exact tiles") {
    import graft.operators.JpegCodec
    def c8(d: Double) = math.max(0, math.min(255, math.floor(d + 0.5).toInt))
    // stored-plane even constants survive the DC-only encode bit-exactly
    def p0(bx: Int, by: Int) = 2 * ((bx + 3 * by + 5) % 128)
    def p1(bx: Int, by: Int) = 2 * ((2 * bx + by + 7) % 128)
    def p2(bx: Int, by: Int) = 2 * ((bx + 2 * by + 11) % 128)
    def p3(bx: Int, by: Int) = 2 * ((3 * bx + by + 13) % 128)
    // (a) transform 0: stored inverted CMYK — RGB = stored·K/255
    val cmyk = JpegCodec.encodeDcOnlyCmyk(32, 24, 0, p0, p1, p2, p3)
    val Some((w, h, 3, px)) = JpegCodec.decodeImage(cmyk)
    assert((w, h) === (32, 24))
    for (y <- 0 until 24; x <- 0 until 32) {
      val (bx, by) = (x / 8, y / 8)
      val k = p3(bx, by)
      val want = (c8(p0(bx, by) * k / 255.0), c8(p1(bx, by) * k / 255.0),
        c8(p2(bx, by) * k / 255.0))
      val o = (y * 32 + x) * 3
      assert(((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)) === want,
        s"cmyk ($x,$y)")
    }
    // (b) transform 2: YCCK — JFIF YCbCr→R'G'B' on planes 0-2, then ·K/255
    val ycck = JpegCodec.encodeDcOnlyCmyk(16, 16, 2, p0, p1, p2, p3)
    val Some((w2, h2, 3, px2)) = JpegCodec.decodeImage(ycck)
    assert((w2, h2) === (16, 16))
    for (y <- 0 until 16; x <- 0 until 16) {
      val (bx, by) = (x / 8, y / 8)
      val lum = p0(bx, by); val pb = p1(bx, by) - 128; val pr = p2(bx, by) - 128
      val k = p3(bx, by)
      val want = (c8(c8(lum + 1.402 * pr) * k / 255.0),
        c8(c8(lum - 0.344136 * pb - 0.714136 * pr) * k / 255.0),
        c8(c8(lum + 1.772 * pb) * k / 255.0))
      val o = (y * 16 + x) * 3
      assert(((px2(o) & 0xff, px2(o + 1) & 0xff, px2(o + 2) & 0xff)) === want,
        s"ycck ($x,$y)")
    }
    // (c) ImageIO cross-check at the RASTER level (JDK 17 reads
    // 4-component JPEGs via SimpleCMYKColorSpace; its final getRGB
    // applies ICC/sRGB gamma, so the comparable surface is the
    // raster): for transform 0 the JDK's true-CMYK raster is exactly
    // 255−stored — independent confirmation that stored values are
    // Adobe-INVERTED, the premise our RGB rendering builds on
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cmyk))
    assert(img0.getRaster.getNumBands === 4)
    val ps = Array(p0 _, p1 _, p2 _, p3 _)
    for (y <- 0 until 24; x <- 0 until 32; c <- 0 until 4)
      assert(img0.getRaster.getSample(x, y, c) === 255 - ps(c)(x / 8, y / 8),
        s"JDK cmyk raster ($x,$y,$c)")
    // …and for YCCK the JDK's bands 0-2 are the same YCbCr→R'G'B'
    // conversion we run (±1 for its fixed-point math), band 3 the
    // inverted K — the transform-2 interpretation cross-validated
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ycck))
    for (y <- 0 until 16; x <- 0 until 16) {
      val (bx, by) = (x / 8, y / 8)
      val lum = p0(bx, by); val pb = p1(bx, by) - 128; val pr = p2(bx, by) - 128
      val want = Seq(c8(lum + 1.402 * pr),
        c8(lum - 0.344136 * pb - 0.714136 * pr), c8(lum + 1.772 * pb))
      for (c <- 0 until 3)
        assert(math.abs(img2.getRaster.getSample(x, y, c) - want(c)) <= 1,
          s"JDK ycck raster ($x,$y,$c)")
      assert(img2.getRaster.getSample(x, y, 3) === 255 - p3(bx, by),
        s"JDK ycck k ($x,$y)")
    }
    // (d) 3-component Adobe transform 0 = stored RGB: splice an APP14
    // ahead of a YCbCr-shaped file and the planes decode untransformed
    val base = JpegCodec.encodeDcOnlyColor(16, 8, 444, p0, p1, p2)
    val app14 = (Array(0xff, 0xee, 0, 14) ++ "Adobe".map(_.toInt) ++
      Array(0, 100, 0, 0, 0, 0, 0)).map(_.toByte)
    val spliced = base.take(2) ++ app14 ++ base.drop(2)
    val Some((_, _, 3, rpx)) = JpegCodec.decodeImage(spliced)
    for (y <- 0 until 8; x <- 0 until 16) {
      val (bx, by) = (x / 8, y / 8)
      val o = (y * 16 + x) * 3
      assert(((rpx(o) & 0xff, rpx(o + 1) & 0xff, rpx(o + 2) & 0xff)) ===
        ((p0(bx, by), p1(bx, by), p2(bx, by))), s"adobe-rgb ($x,$y)")
    }
    // (e) truncation still refused, never a throw
    assert(JpegCodec.decodeImage(cmyk.take(20)) === None)
    assert(JpegCodec.decodeImage(cmyk.take(cmyk.length - 3)) === None)
  }

  test("arithmetic-coded JPEG (SOF9 + SOF10): libjpeg goldens decode, own encoder round-trips exactly") {
    import graft.operators.JpegCodec
    // golden fixtures: written by the system libjpeg (arith_code=TRUE,
    // src/test/resources/arith/gen_arith.c) with libjpeg's own decode
    // as ground truth — a REAL foreign implementation on both sides
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/arith/$name")
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close(); out.toByteArray
    }
    def golden(name: String): (Int, Int, Int, Array[Byte]) = {
      val raw = res(name)
      val nl = raw.indexOf('\n'.toByte)
      val Array(w, h, nc) = new String(raw, 0, nl, "US-ASCII").trim.split(" ").map(_.toInt)
      (w, h, nc, java.util.Arrays.copyOfRange(raw, nl + 1, raw.length))
    }
    // gray goldens: flat/DC-only decode EXACTLY; full-AC within the
    // spec's IDCT allowance (our exact doubles vs libjpeg's islow);
    // rst16 exercises restart-marker re-initialization; the p* files
    // are PROGRESSIVE-arithmetic (SOF10, jpeg_simple_progression:
    // DC first Al=1, banded AC first, AC refinement x2, DC
    // refinement — all four arithmetic scan types)
    for ((name, tol) <- Seq(("flat8", 0), ("dc2", 0), ("ac1", 0),
        ("grad16", 1), ("noisy64", 1), ("rst16", 1),
        ("pflat8", 0), ("pgrad16", 1), ("pnoisy32", 1))) {
      val bytes = res(s"$name.jpg")
      assert(bytes.containsSlice(Array(0xff.toByte, 0xc9.toByte)) ||
        bytes.containsSlice(Array(0xff.toByte, 0xca.toByte)),
        s"$name is SOF9/SOF10")
      val Some((w, h, ch, px)) = JpegCodec.decodeImage(bytes)
      val (gw, gh, gn, want) = golden(s"$name.dec")
      assert((w, h, ch, gn) === ((gw, gh, 1, 1)), name)
      var maxDiff = 0
      for (k <- 0 until w * h) {
        val d = math.abs((px(k) & 0xff) - (want(k) & 0xff))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= tol, s"$name maxDiff=$maxDiff vs libjpeg")
    }
    // color goldens (4:4:4 and 4:2:0-with-constant-chroma): libjpeg's
    // fixed-point YCbCr vs our exact doubles → ±2
    for (name <- Seq("rgb444", "rgb420")) {
      val Some((w, h, 3, px)) = JpegCodec.decodeImage(res(s"$name.jpg"))
      val (gw, gh, gn, want) = golden(s"$name.dec")
      assert((w, h, gn) === ((gw, gh, 3)), name)
      var maxDiff = 0
      for (k <- 0 until w * h * 3) {
        val d = math.abs((px(k) & 0xff) - (want(k) & 0xff))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 2, s"$name maxDiff=$maxDiff vs libjpeg")
    }
    // own DC-only arithmetic encoder: even tiles round-trip BIT-EXACTLY
    // through our decoder (the q90 contract)
    def tv(bx: Int, by: Int): Int = 2 * ((bx + 3 * by + 5) % 128)
    val own = JpegCodec.encodeDcOnlyArithGray(32, 24, tv)
    val Some((ow, oh, 1, opx)) = JpegCodec.decodeImage(own)
    assert((ow, oh) === ((32, 24)))
    for (y <- 0 until 24; x <- 0 until 32)
      assert((opx(y * 32 + x) & 0xff) === tv(x / 8, y / 8), s"own arith tile ($x,$y)")
    // this JDK reads arithmetic JPEGs (newer ImageIO) — a SECOND
    // foreign implementation cross-checks our encoder's output:
    // DC-only constants are exact in any conformant IDCT
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(own))
    for (y <- 0 until 24; x <- 0 until 32)
      assert(jdk.getRaster.getSample(x, y, 0) === tv(x / 8, y / 8),
        s"JDK reads our arith write ($x,$y)")
    // refusals intact: truncation (mid-entropy AND chopped EOI) and
    // a LYING SOF byte (sequential stream relabeled SOF10 — its
    // full-band scan header is illegal for a progressive DC scan)
    assert(JpegCodec.decodeImage(own.take(own.length - 3)) === None)
    assert(JpegCodec.decodeImage(own.take(20)) === None)
    val sof10 = own.clone()
    val sofAt = (0 until sof10.length - 1).find(k =>
      (sof10(k) & 0xff) == 0xff && (sof10(k + 1) & 0xff) == 0xc9).get
    sof10(sofAt + 1) = 0xca.toByte
    assert(JpegCodec.decodeImage(sof10) === None)
    // truncated progressive: drop the last scan + EOI → refused
    val pbytes = res("pgrad16.jpg")
    assert(JpegCodec.decodeImage(pbytes.take(pbytes.length - 12)) === None)
  }

  test("QM coder property round-trip: random symbol streams survive encode→decode") {
    // the golden corpus pins the conventions against libjpeg; this
    // drives the carry/stacked-FF/termination edge paths with seeded
    // random streams over many contexts — any asymmetry between the
    // encoder and its mechanical inverse corrupts the remainder of a
    // stream deterministically
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = 1 + rnd.nextInt(400)
      val nCtx = 1 + rnd.nextInt(8)
      // biased bits exercise long MPS runs (carry chains); mixed bits
      // exercise adaptation and exchange
      val bias = rnd.nextDouble()
      val syms = Array.fill(n)((rnd.nextInt(nCtx), if (rnd.nextDouble() < bias) 1 else 0))
      // drive through the tile encoder's machinery indirectly: encode
      // as a tiny DC-only image is too narrow, so round-trip directly
      val bytes = JpegCodec.qmRoundTripProbe(syms)
      assert(bytes, s"trial $trial (n=$n, nCtx=$nCtx, bias=$bias)")
    }
  }

  test("progressive JPEG: DC-lattice exact (incl. successive approximation), foreign scans ±2") {
    import graft.operators.JpegCodec
    def tv(bx: Int, by: Int): Int = 2 * ((bx + 3 * by + 5) % 128)
    // (a) 2-scan progressive (DC first Al=0 + AC EOB band): decodes to
    // the EXACT tile lattice, byte-identical to the sequential decode
    val seq = JpegCodec.decodeGray(JpegCodec.encodeDcOnlyGray(32, 24, tv)).get._3
    val prog = JpegCodec.encodeDcOnlyProgressiveGray(32, 24, tv, split = false)
    val Some((32, 24, ppx)) = JpegCodec.decodeGray(prog)
    assert(ppx.sameElements(seq), "progressive != sequential")
    // (b) 3-scan with DC successive approximation (Al=1 first scan +
    // refinement bit scan): still bit-exact — the refine path works
    val prog2 = JpegCodec.encodeDcOnlyProgressiveGray(32, 24, tv, split = true)
    val Some((_, _, ppx2)) = JpegCodec.decodeGray(prog2)
    assert(ppx2.sameElements(seq), "split progressive != sequential")
    // ImageIO agrees on our progressive file (DC-only: exact)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog2))
    for (y <- 0 until 24; x <- 0 until 32)
      assert(ref.getRaster.getSample(x, y, 0) === tv(x / 8, y / 8), s"ImageIO ($x,$y)")
    // (c) FOREIGN progressive gray: ImageIO writes a full multi-scan
    // gradient (spectral bands + AC successive approximation); we
    // decode within ±1 of its own read-back
    def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      bos.toByteArray
    }
    val gray = new java.awt.image.BufferedImage(21, 13,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 13; x <- 0 until 21)
      gray.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    val fgray = writeProgressive(gray)
    val Some((21, 13, fpx)) = JpegCodec.decodeGray(fgray)
    val fref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fgray))
    var maxDiff = 0
    for (y <- 0 until 13; x <- 0 until 21) {
      val d = math.abs((fpx(y * 21 + x) & 0xff) - fref.getRaster.getSample(x, y, 0))
      if (d > maxDiff) maxDiff = d
    }
    assert(maxDiff <= 1, s"foreign progressive gray maxDiff=$maxDiff")
    // (d) FOREIGN progressive COLOR (interleaved DC scan + per-
    // component AC bands + refinements), constant chroma: ±2
    val rgbImg = new java.awt.image.BufferedImage(21, 13,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 13; x <- 0 until 21) {
      val v = (x * 11 + y * 7) % 256
      rgbImg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val fcolor = writeProgressive(rgbImg)
    val Some((21, 13, 3, cpx)) = JpegCodec.decodeImage(fcolor)
    val cref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fcolor))
    var cMaxDiff = 0
    for (y <- 0 until 13; x <- 0 until 21; c <- 0 until 3) {
      val d = math.abs((cpx((y * 21 + x) * 3 + c) & 0xff) - cref.getRaster.getSample(x, y, c))
      if (d > cMaxDiff) cMaxDiff = d
    }
    assert(cMaxDiff <= 2, s"foreign progressive color maxDiff=$cMaxDiff")
    // (e) truncation mid-scan / before EOI → None, never a mis-decode
    assert(JpegCodec.decodeImage(prog2.take(prog2.length - 3)) === None)
    assert(JpegCodec.decodeImage(prog2.take(60)) === None)
    // and the gray-tier dispatcher handles progressive transparently
    assert(Multimodal.PixelCodec.decode(prog).map(_._1) === Some("jpeg"))
  }

  test("color raster decode: PNG truecolor/palette, BMP RGB, GIF palette-RGB, ImageIO both ways") {
    import Multimodal.{MiniEncoder, PixelCodec}
    def rgb(x: Int, y: Int) = ((3 * x + y + 5) % 256, (x + 2 * y + 15) % 256, (2 * x + y + 35) % 256)
    def checkTriples(px: Array[Byte], w: Int, h: Int,
        want: (Int, Int) => (Int, Int, Int), what: String): Unit =
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert(((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)) === want(x, y), s"$what ($x,$y)")
      }
    def checkImageIO(bytes: Array[Byte], w: Int, h: Int,
        want: (Int, Int) => (Int, Int, Int), what: String): Unit = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val v = img.getRGB(x, y)
        assert((((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)) === want(x, y), s"$what ($x,$y)")
      }
    }
    // (a) truecolor PNG: odd dims exercise all five bpp-aware filters
    val png = MiniEncoder.pngRgb(13, 9, rgb)
    val Some(("png", 13, 9, 3, ppx)) = PixelCodec.decodeImage(png)
    checkTriples(ppx, 13, 9, rgb, "own png")
    checkImageIO(png, 13, 9, rgb, "ImageIO reads our png")
    // foreign truecolor png (ImageIO writer) decodes bit-exactly
    val fimg = new java.awt.image.BufferedImage(13, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 13) {
      val (r, g, b) = rgb(x, y); fimg.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val fout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(fimg, "png", fout)
    val Some(("png", _, _, 3, fpx)) = PixelCodec.decodeImage(fout.toByteArray)
    checkTriples(fpx, 13, 9, rgb, "foreign png")
    // (b) palette PNG: indices through a non-gray palette
    val pal = Array.tabulate(256)(i => (i, (2 * i) % 256, 255 - i))
    def idx(x: Int, y: Int) = (x * 3 + y * 5 + 7) % 256
    def palRgb(x: Int, y: Int) = pal(idx(x, y))
    val pp = MiniEncoder.pngPal(11, 7, idx, pal)
    val Some(("png", 11, 7, 3, pppx)) = PixelCodec.decodeImage(pp)
    checkTriples(pppx, 11, 7, palRgb, "own palette png")
    checkImageIO(pp, 11, 7, palRgb, "ImageIO reads our palette png")
    // foreign palette png: ImageIO writes color type 3 from an indexed image
    val icm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(i => pal(i)._1.toByte),
      Array.tabulate(256)(i => pal(i)._2.toByte),
      Array.tabulate(256)(i => pal(i)._3.toByte))
    val pimg = new java.awt.image.BufferedImage(11, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 7; x <- 0 until 11) pimg.getRaster.setSample(x, y, 0, idx(x, y))
    val pout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(pimg, "png", pout)
    val Some(("png", _, _, 3, fppx)) = PixelCodec.decodeImage(pout.toByteArray)
    checkTriples(fppx, 11, 7, palRgb, "foreign palette png")
    // (c) BMP RGB both directions (BGR flip + stride)
    val bmp = MiniEncoder.bmp24Rgb(13, 9, rgb)
    val Some(("bmp", 13, 9, 3, bpx)) = PixelCodec.decodeImage(bmp)
    checkTriples(bpx, 13, 9, rgb, "own bmp")
    checkImageIO(bmp, 13, 9, rgb, "ImageIO reads our bmp")
    val bout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(fimg, "bmp", bout)
    val Some(("bmp", _, _, 3, fbpx)) = PixelCodec.decodeImage(bout.toByteArray)
    checkTriples(fbpx, 13, 9, rgb, "foreign bmp")
    // (d) GIF palette-RGB both directions
    val gif = MiniEncoder.gifPal(13, 9, idx, pal)
    val Some(("gif", 13, 9, 3, gpx)) = PixelCodec.decodeImage(gif)
    checkTriples(gpx, 13, 9, palRgb, "own gif")
    checkImageIO(gif, 13, 9, palRgb, "ImageIO reads our gif")
    val gout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(pimg, "gif", gout)
    val Some(("gif", _, _, 3, fgpx)) = PixelCodec.decodeImage(gout.toByteArray)
    checkTriples(fgpx, 11, 7, palRgb, "foreign gif")
    // (e) gray containers keep channels=1 where the format says gray
    val grayPng = MiniEncoder.pngGray(6, 4, (x, y) => (x + y) % 256)
    assert(PixelCodec.decodeImage(grayPng).map(t => (t._1, t._4)) === Some(("png", 1)))
    // and the GRAY dispatcher keeps refusing truecolor PNG (gray-only
    // contract — color flows through decodeImage)
    assert(PixelCodec.decode(png) === None)
    // (f) truncation/garbage → None through the color dispatcher too
    assert(PixelCodec.decodeImage(png.take(6)) === None)
    assert(PixelCodec.decodeImage(bmp.take(6)) === None)
    assert(PixelCodec.decodeImage(gif.take(6)) === None)
    assert(PixelCodec.decodeImage(null) === None)
  }

  test("alpha PNG: types 4/6 decode with alpha dropped, ImageIO-written files exact") {
    import Multimodal.PixelCodec
    // RGBA (type 6): ImageIO writes TYPE_INT_ARGB as color type 6
    val argb = new java.awt.image.BufferedImage(11, 7,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    def rgb(x: Int, y: Int) = ((3 * x + y + 5) % 256, (x + 2 * y + 15) % 256, (2 * x + y + 35) % 256)
    for (y <- 0 until 7; x <- 0 until 11) {
      val (r, g, b) = rgb(x, y)
      val a = (x * 37 + y * 11) % 256 // varying alpha — must be ignored
      argb.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    val aout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", aout)
    val Some(("png", 11, 7, 3, apx)) = PixelCodec.decodeImage(aout.toByteArray)
    for (y <- 0 until 7; x <- 0 until 11) {
      val o = (y * 11 + x) * 3
      assert(((apx(o) & 0xff, apx(o + 1) & 0xff, apx(o + 2) & 0xff)) === rgb(x, y),
        s"RGBA ($x,$y)")
    }
    // gray+alpha (type 4): write via a 2-band gray+alpha raster
    val ga = new java.awt.image.BufferedImage(9, 5,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 5; x <- 0 until 9) {
      val v = (x * 13 + y * 29) % 256
      ga.setRGB(x, y, (((x + y) * 19 % 256) << 24) | (v << 16) | (v << 8) | v)
    }
    // ImageIO keeps r=g=b ARGB as type 6; exercise type 4 with our own
    // bytes instead: rebuild a type-4 stream from the type-6 one is
    // overkill — craft it directly through the public pngEncode seam
    // is private, so go through a known-good writer: ImageIO with a
    // gray+alpha ColorModel
    val gacm = new java.awt.image.ComponentColorModel(
      java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY),
      true, false, java.awt.Transparency.TRANSLUCENT,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val gar = gacm.createCompatibleWritableRaster(9, 5)
    for (y <- 0 until 5; x <- 0 until 9) {
      gar.setSample(x, y, 0, (x * 13 + y * 29) % 256) // luma
      gar.setSample(x, y, 1, (x * 7 + y * 3) % 256)   // alpha — ignored
    }
    val gaImg = new java.awt.image.BufferedImage(gacm, gar, false, null)
    val gout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gaImg, "png", gout)
    val Some(("png", 9, 5, 1, gpx)) = PixelCodec.decodeImage(gout.toByteArray)
    for (y <- 0 until 5; x <- 0 until 9)
      assert((gpx(y * 9 + x) & 0xff) === (x * 13 + y * 29) % 256, s"gray+alpha ($x,$y)")
  }

  test("WAV 8/24/32-bit PCM normalize to int16; javax.sound cross-checks 8-bit") {
    import Multimodal.{MiniEncoder, WavCodec}
    // 8-bit unsigned: raw 0..255 → (v-128)<<8
    def v8(i: Int, c: Int) = (i * 17 + c * 5) % 256
    val w8 = MiniEncoder.wavPcmN(8000, 2, 20, 8, v8)
    val Some((8000, 2, x8)) = WavCodec.decode(w8)
    for (i <- 0 until 20; c <- 0 until 2)
      assert(x8(i * 2 + c).toInt === ((v8(i, c) - 128) << 8), s"8-bit ($i,$c)")
    // javax.sound agrees on the raw 8-bit bytes of OUR file
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(w8))
    assert(ais.getFormat.getSampleSizeInBits === 8)
    val raw = ais.readAllBytes()
    for (j <- 0 until 40) assert((raw(j) & 0xff) === v8(j / 2, j % 2), s"jdk 8-bit $j")
    // 24-bit signed: top 16 bits kept (arithmetic)
    def v24(i: Int, c: Int) = ((i * 100001 + c * 77777) % 8388608) - 4194304
    val w24 = MiniEncoder.wavPcmN(16000, 1, 15, 24, v24)
    val Some((16000, 1, x24)) = WavCodec.decode(w24)
    for (i <- 0 until 15)
      assert(x24(i).toInt === (v24(i, 0) >> 8), s"24-bit $i")
    // 32-bit signed: top 16 bits kept
    def v32(i: Int, c: Int) = (i * 100000007 + c) * (if (i % 2 == 0) 1 else -1)
    val w32 = MiniEncoder.wavPcmN(44100, 1, 12, 32, v32)
    val Some((44100, 1, x32)) = WavCodec.decode(w32)
    for (i <- 0 until 12)
      assert(x32(i).toInt === (v32(i, 0) >> 16), s"32-bit $i")
    // refusals intact: 12-bit nonsense width
    val bad = w8.clone(); bad(34) = 12 // fmt bits-per-sample byte
    assert(WavCodec.decode(bad) === None)
  }

  test("audioFeatures: RMS/zero-crossings/peak match hand math; corrupt rows invalid") {
    import Multimodal.MiniEncoder
    def v(i: Int, c: Int) = ((i * 31 + c * 17 + 21) % 65536) - 32768
    val wav = MiniEncoder.wavPcm(8000, 2, 30, v)
    val feats = Multimodal.audioFeatures(
      Seq(Multimodal.MediaFile(3L, "audio", wav),
        Multimodal.MediaFile(4L, "audio", wav.take(20))).toDS())
      .collect().sortBy(_.doc_id)
    val xs = for (i <- 0 until 30; c <- 0 until 2)
      yield math.max(-32768, math.min(32767, v(i, c)))
    val f = feats(0)
    assert(f.valid && f.n_samples === 60L && f.channels === 2)
    assert(f.rms === math.sqrt(xs.map(x => x.toLong * x).sum.toDouble / 60))
    assert(f.peak === xs.map(math.abs).max)
    val zcWant = (0 until 2).map { c =>
      (1 until 30).count(i => (v(i, c) >= 0) != (v(i - 1, c) >= 0))
    }.sum
    assert(f.zero_crossings === zcWant.toLong)
    assert(!feats(1).valid && feats(1).rms === 0.0)
  }

  test("crafted giant-dimension headers are rejected before allocation") {
    import Multimodal.{MiniEncoder, PixelCodec}
    // take a tiny valid PNG and rewrite IHDR to claim 30000×30000 —
    // the raster cap must return None instead of attempting a ~900 MB
    // allocation (an OutOfMemoryError would kill the task, not the row)
    val png = MiniEncoder.pngGray(4, 4, (x, y) => x + y)
    def wr32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
      b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
    }
    val evil = png.clone()
    wr32(evil, 16, 30000) // IHDR width at offset 8(sig)+8(len,type)
    wr32(evil, 20, 30000) // IHDR height
    assert(PixelCodec.decodePng(evil) === None)
    // same guard on BMP, incl. the Int-overflow corner (w*3 wraps)
    val bmp = MiniEncoder.bmp24(4, 4, (x, y) => x + y)
    def wl32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    val evilBmp = bmp.clone()
    wl32(evilBmp, 18, 0x40000000) // width: 2^30 → w*3 overflows Int
    wl32(evilBmp, 22, 4)
    assert(PixelCodec.decodeBmp(evilBmp) === None)
    // at-cap small dims still decode (the guard is a cap, not a shrink)
    assert(PixelCodec.decodePng(png).isDefined)
  }

  test("decodePixels over synthetic pixel media: stats match the formula") {
    val metas = Multimodal.decodePixels(Multimodal.syntheticPixelMedia(docs.limit(60)))
      .collect().map(m => m.doc_id -> m).toMap
    metas.values.foreach { m =>
      if (m.doc_id % 25 == 0) assert(!m.valid && m.format === "unknown" && m.n_pixels === 0L)
      else {
        val (w, h) = ((m.doc_id % 16 + 1).toInt * 2, (m.doc_id % 12 + 1).toInt * 2)
        assert(m.valid && (m.width, m.height) === (w, h))
        assert(m.format === (if (m.doc_id % 2 == 0) "png" else "bmp"))
        val vs = for (y <- 0 until h; x <- 0 until w) yield ((x + y + m.doc_id) % 256).toInt
        assert(m.n_pixels === w.toLong * h)
        assert(m.pixel_sum === vs.map(_.toLong).sum)
        assert(m.pixel_min === vs.min && m.pixel_max === vs.max)
      }
    }
  }

  test("resizePixels: nearest-neighbor thumbnail stats match the formula") {
    val metas = Multimodal.resizePixels(
      Multimodal.syntheticPixelMedia(docs.limit(40)), 8, 8)
      .collect()
    metas.foreach { m =>
      if (m.doc_id % 25 == 0) assert(!m.valid && m.out_width === 0)
      else {
        val (w, h) = ((m.doc_id % 16 + 1).toInt * 2, (m.doc_id % 12 + 1).toInt * 2)
        assert((m.src_width, m.src_height, m.out_width, m.out_height) === (w, h, 8, 8))
        val vs = for (y <- 0 until 8; x <- 0 until 8)
          yield ((x * w / 8 + y * h / 8 + m.doc_id) % 256).toInt
        assert(m.pixel_sum === vs.map(_.toLong).sum)
        assert(m.pixel_min === vs.min && m.pixel_max === vs.max)
      }
    }
  }

  test("decoders never throw on fuzzed bytes (seeded, incl. truncations of valid files)") {
    import Multimodal.{FormatProbe, MiniEncoder, PixelCodec}
    val rnd = new scala.util.Random(20260812L)
    val valid = Seq(
      MiniEncoder.pngGray(9, 7, (x, y) => x + y),
      MiniEncoder.bmp24(9, 7, (x, y) => x + y),
      MiniEncoder.gifGray(9, 7, (x, y) => x + y),
      MiniEncoder.gifAnimGray(6, 4, 3, (x, y, f) => x + y + f),
      MiniEncoder.wavPcm(8000, 2, 12, (i, c) => i * 100 - c * 7),
      graft.operators.JpegCodec.encodeDcOnlyGray(16, 8, (bx, by) => 2 * (bx + by + 9)),
      graft.operators.JpegCodec.encodeDcOnlyColor(16, 16, 420,
        (bx, by) => 2 * (bx + by), (mx, my) => 2 * mx, (mx, my) => 2 * my),
      MiniEncoder.pngRgb(9, 7, (x, y) => (x, y, x + y)),
      MiniEncoder.pngPal(9, 7, (x, y) => x + y, Array.tabulate(256)(i => (i, i, i))),
      MiniEncoder.bmp24Rgb(9, 7, (x, y) => (x, y, x + y)),
      MiniEncoder.gifPal(9, 7, (x, y) => x + y, Array.tabulate(256)(i => (i, (2 * i) % 256, 255 - i))),
      MiniEncoder.gifAnimComposite(8, 4, 0, Seq(
        MiniEncoder.GifFrame(0, 0, 8, 4, 1, -1, (_, _) => 10),
        MiniEncoder.GifFrame(2, 1, 4, 2, 2, 99, (x, y) => x + y))),
      MiniEncoder.jpeg(9, 7), MiniEncoder.gif(9, 7), MiniEncoder.wav(8000, 1, 4))
    // random garbage, random-length prefixes of valid files, and valid
    // files with one flipped byte: decode/probe must return (not throw)
    val cases =
      (1 to 200).map(_ => Array.fill[Byte](rnd.nextInt(120))(rnd.nextInt().toByte)) ++
      (1 to 200).map { _ =>
        val v = valid(rnd.nextInt(valid.size)); v.take(rnd.nextInt(v.length + 1)) } ++
      (1 to 200).map { _ =>
        val v = valid(rnd.nextInt(valid.size)).clone()
        v(rnd.nextInt(v.length)) = rnd.nextInt().toByte; v }
    cases.foreach { bytes =>
      FormatProbe.probe(bytes) // Option or None — never a throw
      PixelCodec.decode(bytes) // dispatches png/bmp/gif/jpeg
      PixelCodec.decodeImage(bytes) // color-aware dispatch
      PixelCodec.decodeGifFrames(bytes)
      Multimodal.WavCodec.decode(bytes)
    }
  }

  test("GIF LZW property round-trip: random rasters of odd sizes survive encode→decode") {
    import Multimodal.{MiniEncoder, PixelCodec}
    val rnd = new scala.util.Random(42L)
    for (trial <- 0 until 8) {
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(30) + 1
      val px = Array.fill(w * h)(rnd.nextInt(256))
      def v(x: Int, y: Int): Int = px(y * w + x)
      val Some((dw, dh, out)) = PixelCodec.decodeGif(MiniEncoder.gifGray(w, h, v))
      assert((dw, dh) === (w, h), s"trial $trial dims")
      var i = 0
      while (i < w * h) {
        assert((out(i) & 0xff) === px(i), s"trial $trial ($w x $h) px $i")
        i += 1
      }
    }
  }

  test("pixelHistogram: real-raster bin counts sum to n_pixels, match the formula") {
    val feats = Multimodal.pixelHistogram(
      Multimodal.syntheticPixelMedia(docs.limit(30)), bins = 8)
      .collect().groupBy(_.doc_id)
    feats.foreach { case (id, rows) =>
      assert(id % 25 != 0) // corrupt rows yield no bins
      val (w, h) = ((id % 16 + 1).toInt * 2, (id % 12 + 1).toInt * 2)
      assert(rows.map(_.n).sum === w.toLong * h)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield ((x + y + id) % 256).toInt / 32)
        .groupBy(identity).map { case (b, vs) => b -> vs.size.toLong }
      assert(rows.map(r => r.bin -> r.n).toMap === expected)
    }
  }

  test("probeMeta over synthetic real media: per-partition probe, corrupt rows invalid") {
    val meta = Multimodal.probeMeta(Multimodal.syntheticRealMedia(docs)).collect()
    assert(meta.length === docs.count())
    meta.foreach { m =>
      if (m.doc_id % 25 == 0) assert(!m.valid && m.format === "unknown")
      else {
        assert(m.valid, m.toString)
        val expectFmt = (m.doc_id % 4) match {
          case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "wav"
        }
        assert(m.format === expectFmt)
        if (expectFmt != "wav") assert(m.width === (m.doc_id % 64 + 1).toInt * 4)
        else assert(m.sample_rate === 8000 + (m.doc_id % 5).toInt * 8000)
      }
    }
  }

  test("pixelFeatureVectors: dense normalized histograms from real rasters feed Similarity") {
    import graft.operators.Similarity
    val media = Multimodal.syntheticPixelMedia(docs.limit(40))
    val feats = Multimodal.pixelFeatureVectors(media, bins = 16).cache()
    try {
      val rows = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(!rows.contains(0L) && !rows.contains(25L)) // corrupt rows dropped
      rows.foreach { case (id, v) =>
        assert(v.length === 16, s"doc $id dim")
        assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-5, s"doc $id not normalized")
        // matches the long-format histogram operator on the same media
        val (w, h) = ((id % 16 + 1).toInt * 2, (id % 12 + 1).toInt * 2)
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield ((x + y + id) % 256).toInt / 16)
          .groupBy(identity).map { case (b, vs) => b -> vs.size }
        (0 until 16).foreach { b =>
          val e = (expected.getOrElse(b, 0) / (w.toDouble * h)).toFloat
          assert(v(b) === e, s"doc $id bin $b")
        }
      }
      // the vectors drop straight into the similarity stack: self is
      // the top hit of a top-k over the feature column
      val q = rows(7L).toArray
      val top = Similarity.bruteForceTopK(feats, "doc_id", "feature", q, 3).collect()
      assert(top(0).getLong(0) === 7L)
      assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-9)
    } finally feats.unpersist()
  }

  test("feature extraction yields fixed-dim vectors joinable to embeddings") {
    val feats = Multimodal.features(Multimodal.syntheticMedia(docs), dim = 16)
    assert(feats.columns.toSeq === Seq("doc_id", "media_embedding"))
    val row = feats.orderBy("doc_id").collect()(0)
    assert(row.getSeq[Float](1).length === 16)
  }

  test("sampling factors 3-4: libjpeg goldens decode, DC-only tiles exact, JDK cross-check") {
    import graft.operators.JpegCodec
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/sampling/$name")
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close(); out.toByteArray
    }
    def golden(name: String): (Int, Int, Int, Array[Byte]) = {
      val raw = res(name)
      val nl = raw.indexOf('\n'.toByte)
      val Array(w, h, nc) = new String(raw, 0, nl, "US-ASCII").trim.split(" ").map(_.toInt)
      (w, h, nc, java.util.Arrays.copyOfRange(raw, nl + 1, raw.length))
    }
    // (a) libjpeg goldens (gen_samp.c): gray-as-RGB rasters make
    // Cb = Cr = 128 EXACTLY in libjpeg's fixed-point converter, so
    // fancy-vs-replication upsampling cannot differ and the residual
    // tolerance is the IDCT's own ±1 (±2 kept for the color round).
    // s41odd/s42odd have non-MCU-multiple dims (partial edge MCUs at
    // factor 4 — the crop path).
    for (name <- Seq("s41", "s41odd", "s31", "s14", "s42", "s42odd")) {
      val Some((w, h, 3, px)) = JpegCodec.decodeImage(res(s"$name.jpg"))
      val (gw, gh, gn, want) = golden(s"$name.dec")
      assert((w, h, gn) === ((gw, gh, 3)), name)
      var maxDiff = 0
      for (k <- 0 until w * h * 3) {
        val d = math.abs((px(k) & 0xff) - (want(k) & 0xff))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 2, s"$name maxDiff=$maxDiff vs libjpeg")
    }
    // (b) own DC-only encoder at 4:1:1 / 3:1 / 1:4: even tiles are
    // formula-exact through our decoder (the q91 contract)
    for ((sub, yh, yvs) <- Seq((411, 4, 1), (311, 3, 1), (114, 1, 4))) {
      val w = 8 * yh * 2; val h = 8 * yvs * 2
      def yv(bx: Int, by: Int) = 2 * ((bx + 3 * by + 5) % 128)
      def cbv(mx: Int, my: Int) = 2 * ((2 * mx + my + 7) % 128)
      def crv(mx: Int, my: Int) = 2 * ((mx + 2 * my + 11) % 128)
      val bytes = JpegCodec.encodeDcOnlyColor(w, h, sub, yv, cbv, crv)
      val Some((dw, dh, 3, px)) = JpegCodec.decodeImage(bytes)
      assert((dw, dh) === ((w, h)), s"sub=$sub")
      def clamp8(d: Double): Int = math.max(0, math.min(255, math.floor(d + 0.5).toInt))
      for (y <- 0 until h; x <- 0 until w) {
        val lum = yv(x / 8, y / 8)
        val pb = cbv(x / (8 * yh), y / (8 * yvs)) - 128
        val pr = crv(x / (8 * yh), y / (8 * yvs)) - 128
        val o = (y * w + x) * 3
        assert((px(o) & 0xff) === clamp8(lum + 1.402 * pr), s"sub=$sub R ($x,$y)")
        assert((px(o + 1) & 0xff) === clamp8(lum - 0.344136 * pb - 0.714136 * pr), s"sub=$sub G ($x,$y)")
        assert((px(o + 2) & 0xff) === clamp8(lum + 1.772 * pb), s"sub=$sub B ($x,$y)")
      }
      // a SECOND foreign implementation reads our high-sampling
      // writes: per-MCU constants are exact under any conformant
      // upsampler, so the JDK must agree exactly
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK refused sub=$sub")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val lum = yv(x / 8, y / 8)
        val pb = cbv(x / (8 * yh), y / (8 * yvs)) - 128
        val pr = crv(x / (8 * yh), y / (8 * yvs)) - 128
        assert(((rgb >> 16) & 0xff) === clamp8(lum + 1.402 * pr), s"JDK sub=$sub R ($x,$y)")
        assert(((rgb >> 8) & 0xff) === clamp8(lum - 0.344136 * pb - 0.714136 * pr), s"JDK sub=$sub G ($x,$y)")
        assert((rgb & 0xff) === clamp8(lum + 1.772 * pb), s"JDK sub=$sub B ($x,$y)")
      }
    }
    // (c) the T.81 B.2.3 MCU cap holds: a lying SOF claiming 4x4 luma
    // (4·4+1+1 = 18 > 10 data units) is refused
    val ok = JpegCodec.encodeDcOnlyColor(64, 16, 411, (_, _) => 100, (_, _) => 128, (_, _) => 128)
    val sofAt = (0 until ok.length - 1).find(k =>
      (ok(k) & 0xff) == 0xff && (ok(k + 1) & 0xff) == 0xc0).get
    val lying = ok.clone()
    lying(sofAt + 11) = 0x44.toByte // comp 1 sampling 4x4
    assert(JpegCodec.decodeImage(lying) === None)
  }

  test("lossless JPEG (SOF3): exact round-trip across predictors, precisions, point transform, restarts") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(1234)
    // every predictor × precisions 2..16 × 1 or 3 components ×
    // restart interval off/on: decode(encode(x)) must equal x (or
    // (x >> pt) << pt under a point transform) — lossless has no
    // tolerance, a single wrong difference corrupts the remainder
    for (psv <- 1 to 7; (prec, nc, dri) <- Seq((8, 1, 0), (12, 3, 0), (16, 1, 5), (2, 1, 0), (4, 3, 7))) {
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(11)
      val vals = Array.fill(nc, w * h)(rnd.nextInt(1 << prec))
      val bytes = JpegCodec.encodeLossless(w, h, nc, prec, psv, 0, dri,
        (x, y, c) => vals(c)(y * w + x))
      val Some((dw, dh, dnc, out, dprec)) = JpegCodec.decodeLossless(bytes)
      assert((dw, dh, dnc, dprec) === ((w, h, nc, prec)), s"psv=$psv prec=$prec")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
        assert(out((y * w + x) * nc + c) === vals(c)(y * w + x),
          s"psv=$psv prec=$prec nc=$nc dri=$dri ($x,$y,$c)")
    }
    // point transform: the decoder restores the shifted domain
    val vals = Array.tabulate(12 * 7)(i => (i * 37 + 5) % 256)
    val pt2 = JpegCodec.encodeLossless(12, 7, 1, 8, 4, 2, 0, (x, y, _) => vals(y * 12 + x))
    val Some((_, _, _, outPt, _)) = JpegCodec.decodeLossless(pt2)
    for (i <- 0 until 12 * 7)
      assert(outPt(i) === ((vals(i) >> 2) << 2), s"pt sample $i")
    // refusals: truncation (never a mis-decode), subsampled lossless
    // (declared boundary), and the generic surfaces stay closed to
    // SOF3 (decodeImage must not half-read a lossless frame)
    val good = JpegCodec.encodeLossless(9, 5, 1, 12, 1, 0, 0, (x, y, _) => x * 41 + y)
    assert(JpegCodec.decodeLossless(good.take(good.length - 2)) === None)
    assert(JpegCodec.decodeLossless(good.take(11)) === None)
    assert(JpegCodec.decodeImage(good) === None)
    assert(JpegCodec.decode12(good) === None)
    val sub = good.clone()
    val sofAt = (0 until sub.length - 1).find(k =>
      (sub(k) & 0xff) == 0xff && (sub(k + 1) & 0xff) == 0xc3).get
    sub(sofAt + 11) = 0x21.toByte // claim 2x1 sampling
    assert(JpegCodec.decodeLossless(sub) === None)
  }

  test("12-bit JPEG (SOF1/12): DC-lattice exact, wider categories, refusals") {
    import graft.operators.JpegCodec
    // even tiles in 0..4094 reconstruct bit-exactly at the 2048
    // level shift — the q93 contract
    def v(bx: Int, by: Int): Int = 2 * ((bx + 3 * by + 11 * 17) % 2048)
    val bytes = JpegCodec.encodeDcOnlyGray12(32, 24, v)
    val Some((w, h, 1, px)) = JpegCodec.decode12(bytes)
    assert((w, h) === ((32, 24)))
    for (y <- 0 until 24; x <- 0 until 32)
      assert((px(y * 32 + x) & 0xffff) === v(x / 8, y / 8), s"12-bit tile ($x,$y)")
    // values above 255 actually occur (the point of the depth)
    assert(px.map(_ & 0xffff).max > 255)
    // a diff spanning the full range exercises wide DC categories:
    // tiles alternating 0 and 4094 swing the DC by ±2047 (category 11)
    val swing = JpegCodec.encodeDcOnlyGray12(32, 8, (bx, _) => if (bx % 2 == 0) 0 else 4094)
    val Some((_, _, 1, spx)) = JpegCodec.decode12(swing)
    for (y <- 0 until 8; x <- 0 until 32)
      assert((spx(y * 32 + x) & 0xffff) === (if ((x / 8) % 2 == 0) 0 else 4094), s"swing ($x,$y)")
    // COLOR at 12-bit: even Y'CbCr tile constants are exact through
    // the stored planes, so the decoded 12-bit R'G'B' is the JFIF
    // formula at the 2048 center of exact inputs
    def cyv(bx: Int, by: Int) = 2 * ((17 * bx + 51 * by + 905) % 2048)
    def ccb(bx: Int, by: Int) = 2 * ((29 * bx + 7 * by + 1501) % 2048)
    def ccr(bx: Int, by: Int) = 2 * ((11 * bx + 37 * by + 333) % 2048)
    val color = JpegCodec.encodeDcOnlyColor12(24, 16, cyv, ccb, ccr)
    val Some((cw, chh, 3, cpx)) = JpegCodec.decode12(color)
    assert((cw, chh) === ((24, 16)))
    def clamp12(d: Double): Int =
      math.max(0, math.min(4095, math.floor(d + 0.5).toInt))
    for (y <- 0 until 16; x <- 0 until 24) {
      val lum = cyv(x / 8, y / 8)
      val pb = ccb(x / 8, y / 8) - 2048
      val pr = ccr(x / 8, y / 8) - 2048
      val o = (y * 24 + x) * 3
      assert((cpx(o) & 0xffff) === clamp12(lum + 1.402 * pr), s"12c R ($x,$y)")
      assert((cpx(o + 1) & 0xffff) === clamp12(lum - 0.344136 * pb - 0.714136 * pr), s"12c G ($x,$y)")
      assert((cpx(o + 2) & 0xffff) === clamp12(lum + 1.772 * pb), s"12c B ($x,$y)")
    }
    // values above the 8-bit range occur (the point of the depth);
    // individual channels may clamp under strong chroma offsets
    assert(cpx.exists(v => (v & 0xffff) > 255))
    // 4:2:0 at 12-bit drives the generic interleaved-MCU loop (Y 2×2,
    // chroma constant per 16×16 MCU — exact under replication)
    val c420 = JpegCodec.encodeDcOnlyColor12(32, 16, cyv, ccb, ccr, subsample = 420)
    val Some((sw, sh, 3, spx420)) = JpegCodec.decode12(c420)
    assert((sw, sh) === ((32, 16)))
    for (y <- 0 until 16; x <- 0 until 32) {
      val lum = cyv(x / 8, y / 8)
      val pb = ccb(x / 16, y / 16) - 2048
      val pr = ccr(x / 16, y / 16) - 2048
      val o = (y * 32 + x) * 3
      assert((spx420(o) & 0xffff) === clamp12(lum + 1.402 * pr), s"12c420 R ($x,$y)")
      assert((spx420(o + 1) & 0xffff) === clamp12(lum - 0.344136 * pb - 0.714136 * pr), s"12c420 G ($x,$y)")
      assert((spx420(o + 2) & 0xffff) === clamp12(lum + 1.772 * pb), s"12c420 B ($x,$y)")
    }
    // refusals: the 8-bit surfaces refuse 12-bit frames and vice
    // versa; truncation is never a mis-decode
    assert(JpegCodec.decodeImage(bytes) === None)
    assert(JpegCodec.decodeGray(bytes) === None)
    assert(JpegCodec.decodeImage(color) === None)
    val eight = JpegCodec.encodeDcOnlyGray(16, 8, (bx, by) => 2 * (bx + by + 30))
    assert(JpegCodec.decode12(eight) === None)
    assert(JpegCodec.decode12(bytes.take(bytes.length - 3)) === None)
    assert(JpegCodec.decode12(bytes.take(20)) === None)
    assert(JpegCodec.decode12(color.take(color.length - 3)) === None)
  }

  test("r10: decode12 refuses a stream whose referenced DQT never arrived") {
    import graft.operators.JpegCodec
    // the quant arrays pre-zero, so before r10 a 12-bit SOF1 stream
    // missing its DQT 'decoded' to a flat all-2048 raster instead of
    // None — the 8-bit path always refused via qt.getOrElse
    val good = JpegCodec.encodeDcOnlyGray12(16, 8, (bx, by) => 2 * (bx + by + 100))
    val at = (0 until good.length - 1).find(k =>
      (good(k) & 0xff) == 0xff && (good(k + 1) & 0xff) == 0xdb).get
    val len = ((good(at + 2) & 0xff) << 8) | (good(at + 3) & 0xff)
    val stripped = good.take(at) ++ good.drop(at + 2 + len)
    assert(JpegCodec.decode12(good).isDefined)
    assert(JpegCodec.decode12(stripped) === None)
  }

  test("r10: 12-bit progressive + arithmetic JPEG — the last non-hierarchical cells") {
    import graft.operators.JpegCodec
    // the q93 even-tile lattice: every frame type must reconstruct
    // these constants BIT-EXACTLY (DC = (c−2048)/2 integral, flat
    // quant 16, DC-only blocks)
    def v(bx: Int, by: Int): Int = 2 * ((5 * bx + 3 * by + 271) % 2048)
    val w = 32; val h = 24
    def checkExact(name: String, bytes: Array[Byte]): Unit = {
      val decoded = JpegCodec.decode12(bytes)
      assert(decoded.isDefined, s"$name refused")
      val Some((dw, dh, 1, px)) = decoded
      assert((dw, dh) === ((w, h)), name)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xffff) === v(x / 8, y / 8), s"$name ($x,$y)")
    }
    // SOF2 progressive Huffman: successive approximation (DC first at
    // Al=1, DC refinement, all-EOB AC scan) and the single-step form
    val progSplit = JpegCodec.encodeDcOnlyProgressiveGray12(w, h, v)
    val progOne = JpegCodec.encodeDcOnlyProgressiveGray12(w, h, v, split = false)
    checkExact("SOF2/12 split", progSplit)
    checkExact("SOF2/12 one-step", progOne)
    // SOF9 sequential arithmetic: the QM coder at precision 12
    val arith = JpegCodec.encodeDcOnlyArithGray12(w, h, v)
    checkExact("SOF9/12", arith)
    // SOF10 progressive arithmetic: per-scan codewords (stats,
    // registers and DC prediction reset at each SOS)
    val progArith = JpegCodec.encodeDcOnlyProgressiveArithGray12(w, h, v)
    val progArithOne = JpegCodec.encodeDcOnlyProgressiveArithGray12(w, h, v, split = false)
    checkExact("SOF10/12 split", progArith)
    checkExact("SOF10/12 one-step", progArithOne)
    // wide DC swings through the successive-approximation path:
    // alternating 0/4094 tiles exercise category-11 diffs whose low
    // bit rides the refinement scan
    def sv(bx: Int, by: Int): Int = if ((bx + by) % 2 == 0) 0 else 4094
    for ((nm, enc) <- Seq(
      ("prog swing", JpegCodec.encodeDcOnlyProgressiveGray12(w, h, sv _)),
      ("progArith swing", JpegCodec.encodeDcOnlyProgressiveArithGray12(w, h, sv _)),
      ("arith swing", JpegCodec.encodeDcOnlyArithGray12(w, h, sv _)))) {
      val Some((_, _, 1, spx)) = JpegCodec.decode12(enc)
      for (y <- 0 until h; x <- 0 until w)
        assert((spx(y * w + x) & 0xffff) === sv(x / 8, y / 8), s"$nm ($x,$y)")
    }
    // cross-surface refusals hold: the 8-bit decoder refuses all
    // 12-bit frame types; truncations are never a mis-decode (the
    // progressive EOI check and the arithmetic hitEnd/EOI checks)
    for (bytes <- Seq(progSplit, arith, progArith)) {
      assert(JpegCodec.decodeImage(bytes) === None)
      assert(JpegCodec.decode12(bytes.take(bytes.length - 3)) === None)
      assert(JpegCodec.decode12(bytes.take(24)) === None)
    }
    // an 8-bit progressive stream stays the 8-bit surface's job
    val eightProg = JpegCodec.encodeDcOnlyProgressiveGray(16, 8, (bx, by) => 2 * (bx + by + 30))
    assert(JpegCodec.decode12(eightProg) === None)
    assert(JpegCodec.decodeImage(eightProg).isDefined)
  }

  /** Minimal entropy bit writer for the hand-authored streams below —
    * deliberately NOT the codec's own BitWriter, so the fixtures stay
    * independent of the code under test. */
  private class HandBits {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var acc = 0; private var n = 0
    def bits(v: Int, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); n += 1
        if (n == 8) {
          out += acc.toByte
          if ((acc & 0xff) == 0xff) out += 0x00.toByte // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = while (n != 0) bits(1, 1)
  }

  /** One diff through the 8-codes-of-length-3 DC table (category c →
    * code = 3-bit binary of c) + T.81 F.1.2.1 magnitude bits. */
  private def handDiff(bw: HandBits, diff: Int): Unit = {
    val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    bw.bits(s, 3)
    if (s > 0) bw.bits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
  }

  // shared segments for the hand-authored streams: a DC Huffman table
  // with eight length-3 codes for categories 0-7 (code(c) = c)
  private def handDht: Seq[Int] =
    Seq(0xff, 0xc4, 0x00, 0x1b, 0x00, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 1, 2, 3, 4, 5, 6, 7)

  test("r10: lossless predictors validated against hand-computed T.81 goldens") {
    import graft.operators.JpegCodec
    // No independent SOF3 codec exists in this container (system
    // libjpeg-turbo is 2.1.x — lossless landed in 3.0; the JDK reader
    // is 6b-based), so the independent ground truth is the SPEC
    // ITSELF: streams authored byte-by-byte with a test-local bit
    // writer, expected samples computed by hand from H.1.2.1/H.2.1.
    // The sample values are chosen to DISCRIMINATE the readings a
    // symmetric encoder/decoder misreading would hide from the
    // round-trip gate: predictors 5/6 hit odd NEGATIVE (Rb-Rc)/
    // (Ra-Rc) intermediates, where T.81's arithmetic-right-shift
    // (floor) differs from truncating division, and the DRI stream
    // pins H.2.1's default-prediction scope at each restart.
    def stream(psv: Int, dri: Int, diffs: Seq[Seq[Int]]): Array[Byte] = {
      val head = Seq(0xff, 0xd8) ++ handDht ++
        (if (dri > 0) Seq(0xff, 0xdd, 0x00, 0x04, (dri >> 8) & 0xff, dri & 0xff)
         else Seq.empty) ++
        Seq(0xff, 0xc3, 0x00, 0x0b, 8, 0, 3, 0, 3, 1, // prec 8, 3x3, 1 comp
          1, 0x11, 0, // id 1, 1x1, tq 0 (unused in lossless)
          0xff, 0xda, 0x00, 0x08, 1, 1, 0x00, psv, 0, 0x00)
      val bw = new HandBits
      diffs.zipWithIndex.foreach { case (interval, k) =>
        if (k > 0) { // restart marker between intervals
          bw.flushOnes()
          bw.out += 0xff.toByte; bw.out += (0xd0 + ((k - 1) % 8)).toByte
        }
        interval.foreach(d => handDiff(bw, d))
      }
      bw.flushOnes()
      (head.map(_.toByte) ++ bw.out ++ Seq(0xff.toByte, 0xd9.toByte)).toArray
    }
    // psv 5: P = Ra + ((Rb - Rc) >> 1); (1,2) has Rb-Rc = -55, whose
    // arithmetic shift gives -28 (truncation would give -27 → 73)
    val p5 = stream(5, 0, Seq(Seq(-118, 110, -55, 40, -5, 0, -5, 3, -3)))
    val Some((3, 3, 1, o5, 8)) = JpegCodec.decodeLossless(p5)
    assert(o5.toSeq === Seq(10, 120, 65, 50, 100, 72, 45, 73, 56))
    // psv 6: P = Rb + ((Ra - Rc) >> 1); (1,2) has Ra-Rc = -19 → -10
    // (truncation -9 → 56), (2,1) has -5 → -3 (truncation -2 → 99)
    val p6 = stream(6, 0, Seq(Seq(-118, 110, -55, 40, -39, 0, -5, 0, 2)))
    val Some((3, 3, 1, o6, 8)) = JpegCodec.decodeLossless(p6)
    assert(o6.toSeq === Seq(10, 120, 65, 50, 101, 55, 45, 98, 55))
    // psv 5 with DRI 4: MCUs 4 and 8 open restart intervals, so they
    // predict the DEFAULT 2^(P-Pt-1) = 128 (H.2.1), NOT their
    // neighbors — same raster as p5, different diffs prove the scope
    val pr = stream(5, 4, Seq(
      Seq(-118, 110, -55, 40), Seq(-28, 0, -5, 3), Seq(-72)))
    val Some((3, 3, 1, or5, 8)) = JpegCodec.decodeLossless(pr)
    assert(or5.toSeq === Seq(10, 120, 65, 50, 100, 72, 45, 73, 56))
  }

  test("r10: T.81 B.2.3 cap binds interleaved scans, not progressive frames") {
    import graft.operators.JpegCodec
    // hand-authored PROGRESSIVE color frame with sampling 4x1,1x1,1x1
    // (sum 12 > 10): legal when every scan is non-interleaved — was
    // refused at SOF parse before r10
    def scan(compId: Int, diffs: Seq[Int]): Seq[Byte] = {
      val bw = new HandBits
      diffs.foreach(d => handDiff(bw, d))
      bw.flushOnes()
      Seq(0xff, 0xda, 0x00, 0x08, 1, compId, 0x00, 0, 0, 0x00).map(_.toByte) ++ bw.out
    }
    val dqt = Seq(0xff, 0xdb, 0x00, 0x43, 0x00) ++ Seq.fill(64)(1)
    val sof = Seq(0xff, 0xc2, 0x00, 0x11, 8, 0, 8, 0, 32, 3, // prec 8, 8x32, 3 comps
      1, 0x41, 0, 2, 0x11, 0, 3, 0x11, 0)
    val head = (Seq(0xff, 0xd8) ++ dqt ++ handDht ++ sof).map(_.toByte)
    // Y: 4 blocks (hs=4), DC 64 then flat → samples 64/8 + 128 = 136;
    // Cb/Cr: one block each at DC 0 → neutral 128 → gray output
    val ok = (head ++ scan(1, Seq(64, 0, 0, 0)) ++ scan(2, Seq(0)) ++ scan(3, Seq(0)) ++
      Seq(0xff.toByte, 0xd9.toByte)).toArray
    val Some((w, h, 3, px)) = JpegCodec.decodeImage(ok)
    assert((w, h) === ((32, 8)))
    assert(px.forall(b => (b & 0xff) == 136), "flat gray 136 expected")
    // the SAME frame with an INTERLEAVED (Ns=3) DC scan is where
    // B.2.3 actually binds: 12 data units per MCU → refused at SOS
    val interleaved = (head ++
      Seq(0xff, 0xda, 0x00, 0x0c, 3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00).map(_.toByte) ++
      Seq(0x00.toByte, 0xff.toByte, 0xd9.toByte)).toArray
    assert(JpegCodec.decodeImage(interleaved) === None)
  }
}
