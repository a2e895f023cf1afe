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

  test("feature extraction yields fixed-dim vectors joinable to embeddings") {
    val feats = Multimodal.features(Multimodal.syntheticMedia(docs), dim = 16)
    assert(feats.columns.toSeq === Seq("doc_id", "media_embedding"))
    val row = feats.orderBy("doc_id").collect()(0)
    assert(row.getSeq[Float](1).length === 16)
  }
}
