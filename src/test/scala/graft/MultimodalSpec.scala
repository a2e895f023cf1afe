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

  test("feature extraction yields fixed-dim vectors joinable to embeddings") {
    val feats = Multimodal.features(Multimodal.syntheticMedia(docs), dim = 16)
    assert(feats.columns.toSeq === Seq("doc_id", "media_embedding"))
    val row = feats.orderBy("doc_id").collect()(0)
    assert(row.getSeq[Float](1).length === 16)
  }
}
