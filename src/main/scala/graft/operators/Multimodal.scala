package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata — the
  * only layout that scales: bytes stay columnar/compressed in Parquet,
  * metadata is queryable without touching payloads, and decode happens
  * per partition with a per-partition decoder instance (the Scala
  * analog of `mapInPandas` batches).
  *
  * The actual codec step is STUBBED: this container has no image/audio
  * libraries, so [[FakeCodec]] reads a deterministic 16-byte header
  * `[magic|width|height|n_frames]` instead of libjpeg/ffmpeg. Every
  * seam a real decoder needs — partition-wise batching, schema,
  * failure marking (corrupt rows yield null metadata, they don't kill
  * the job), frame fan-out — is real and tested.
  */
object Multimodal {

  case class MediaFile(doc_id: Long, media_type: String, content: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, width: Int, height: Int,
      n_frames: Int, byte_size: Int, valid: Boolean)
  case class Frame(doc_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  val Magic: Int = 0x4D454449 // "MEDI"

  implicit val mediaEnc: Encoder[MediaFile] = Encoders.product[MediaFile]
  implicit val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  /** Stub codec. A real deployment replaces exactly this object with
    * bindings to an image/audio library; everything else stands. */
  object FakeCodec {
    def encode(docId: Long, mediaType: String): Array[Byte] = {
      val width = (docId % 64 + 1).toInt * 16
      val height = (docId % 48 + 1).toInt * 16
      val frames = if (mediaType == "video") (docId % 30 + 1).toInt else 1
      val payload = (docId % 251).toInt
      val buf = ByteBuffer.allocate(16 + 64)
      buf.putInt(Magic).putInt(width).putInt(height).putInt(frames)
      (0 until 64).foreach(i => buf.put(((payload + i) % 256).toByte))
      buf.array()
    }

    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] =
      if (bytes == null || bytes.length < 16) None
      else {
        val buf = ByteBuffer.wrap(bytes)
        if (buf.getInt() != Magic) None
        else Some((buf.getInt(), buf.getInt(), buf.getInt()))
      }
  }

  /** Deterministic synthetic media over the documents table (the test
    * stand-in for "a bucket of jpeg/mp4 files"). */
  def syntheticMedia(documents: DataFrame): Dataset[MediaFile] = {
    val spark = documents.sparkSession
    documents.select(col("doc_id"), col("lang")).as(Encoders.product[(Long, String)])
      .map { case (id, _) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaFile(id, mt, FakeCodec.encode(id, mt))
      }(mediaEnc)
  }

  /** Decode metadata per partition: one codec per partition, corrupt
    * payloads marked invalid instead of failing the stage. */
  def decodeMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] =
    media.mapPartitions { iter =>
      // per-partition decoder init goes here in a real codec
      iter.map { m =>
        FakeCodec.decodeHeader(m.content) match {
          case Some((w, h, f)) =>
            MediaMeta(m.doc_id, m.media_type, w, h, f, m.content.length, valid = true)
          case None =>
            MediaMeta(m.doc_id, m.media_type, 0, 0, 0,
              if (m.content == null) 0 else m.content.length, valid = false)
        }
      }
    }(metaEnc)

  /** Frame sampling for video rows: every `stride`-th frame index with
    * its (stub-)decoded bytes. Fan-out is bounded by n_frames/stride —
    * at scale this is the explode that must NOT run on image rows. */
  def sampleFrames(media: Dataset[MediaFile], stride: Int): Dataset[Frame] =
    media.filter(_.media_type == "video").flatMap { m =>
      FakeCodec.decodeHeader(m.content) match {
        case Some((_, _, frames)) =>
          (0 until frames by stride).map { i =>
            Frame(m.doc_id, i, m.content.drop(16)) // stub: payload = every frame
          }
        case None => Seq.empty
      }
    }(frameEnc)

  /** Stub feature extraction: bytes → fixed-dim Float vector (the
    * shape a real vision encoder produces), deterministic from the
    * payload so pipelines downstream are testable. */
  def features(media: Dataset[MediaFile], dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    media.map { m =>
      val base = if (m.content == null) 0 else m.content.drop(16).headOption.getOrElse(0: Byte).toInt
      (m.doc_id, Array.tabulate(dim)(i => ((base + i) % 17).toFloat / 17f))
    }(Encoders.product[(Long, Array[Float])])
      .toDF("doc_id", "media_embedding")
  }
}
