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
  * Two codec tiers:
  * - [[FormatProbe]] is REAL: PNG/JPEG/GIF/BMP/WAV container headers
  *   parsed from the actual file bytes (signature dispatch, JPEG SOF
  *   marker walk, RIFF chunk fields) — pure JVM, no media libraries,
  *   driver-gated against minimal VALID files ([[MiniEncoder]]).
  * - Pixel/sample DECODE is STUBBED ([[FakeCodec]], deterministic
  *   16-byte header): this container has no libjpeg/ffmpeg. Every seam
  *   a real decoder needs — partition-wise batching, schema, failure
  *   marking (corrupt rows yield invalid metadata, they don't kill the
  *   job), frame fan-out — is real and tested.
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

  // ---- real container-format probing (no stub) ------------------------

  case class ProbedMeta(doc_id: Long, format: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, byte_size: Int, valid: Boolean)
  implicit val probedEnc: Encoder[ProbedMeta] = Encoders.product[ProbedMeta]

  /** REAL header parsing for the standard container formats — PNG
    * (IHDR), JPEG (SOF marker walk), GIF, BMP, WAV (RIFF/fmt) — pure
    * JVM byte arithmetic, no media libraries. This is the honest part
    * of the codec: format detection and dimensional metadata come from
    * the actual file bytes; only pixel/sample DECODE remains stubbed
    * (no codec libraries in this container). */
  object FormatProbe {
    private def u16be(b: Array[Byte], i: Int) =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32be(b: Array[Byte], i: Int) =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def u16le(b: Array[Byte], i: Int) =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def u32le(b: Array[Byte], i: Int) =
      ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def ascii(b: Array[Byte], i: Int, s: String) =
      b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (format, width, height, sampleRate, channels); dimensions 0
      * where the format has none. None = unrecognized/truncated. */
    def probe(b: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
      if (b == null || b.length < 12) None
      else if (b.take(8).sameElements(PngSig))
        // IHDR is mandatory-first: length(4) "IHDR" width(4) height(4)
        if (b.length >= 24 && ascii(b, 12, "IHDR"))
          Some(("png", u32be(b, 16), u32be(b, 20), 0, 0))
        else None
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk FF-prefixed segments to the first SOFn frame header
        var i = 2
        while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
          val m = b(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            return Some(("jpeg", u16be(b, i + 7), u16be(b, i + 5), 0, 0))
          i += 2 + u16be(b, i + 2)
        }
        None
      }
      else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))
        Some(("gif", u16le(b, 6), u16le(b, 8), 0, 0))
      else if (ascii(b, 0, "BM") && b.length >= 26)
        Some(("bmp", u32le(b, 18), u32le(b, 22), 0, 0))
      else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE") && b.length >= 28 && ascii(b, 12, "fmt "))
        Some(("wav", 0, 0, u32le(b, 24), u16le(b, 22)))
      else None
    }
  }

  /** Minimal VALID files of each container format (correct signatures,
    * chunk structure, CRCs where the format demands them) — the
    * synthetic stand-in is real enough that any standards-conforming
    * reader parses it, so the probe is tested against the format, not
    * against itself. */
  object MiniEncoder {
    def png(w: Int, h: Int): Array[Byte] = {
      val ihdr = ByteBuffer.allocate(17)
      ihdr.put("IHDR".getBytes("US-ASCII"))
        .putInt(w).putInt(h)
        .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      val crc = new java.util.zip.CRC32
      crc.update(ihdr.array())
      val buf = ByteBuffer.allocate(8 + 4 + 17 + 4)
      buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
        .putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
      buf.array()
    }

    def jpeg(w: Int, h: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(2 + 18 + 13 + 2)
      buf.put(Array(0xff, 0xd8).map(_.toByte))                       // SOI
      buf.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort)  // APP0/JFIF
        .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        .putShort(0x0101.toShort).put(0.toByte)
        .putShort(1.toShort).putShort(1.toShort).put(0.toByte).put(0.toByte)
      buf.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11.toShort)  // SOF0
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
        .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
      buf.put(Array(0xff, 0xd9).map(_.toByte))                       // EOI
      buf.array()
    }

    def gif(w: Int, h: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(6 + 7 + 1).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("GIF89a".getBytes("US-ASCII"))
        .putShort(w.toShort).putShort(h.toShort)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      buf.put(0x3b.toByte) // trailer
      buf.array()
    }

    def wav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
      val dataLen = nSamples * channels * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(channels.toShort)
        .putInt(sampleRate).putInt(sampleRate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      buf.array()
    }
  }

  /** Deterministic REAL-format media over the documents table: each
    * doc gets a minimal valid PNG/JPEG/GIF/WAV keyed on doc_id; every
    * 25th payload is truncated to exercise the corrupt-row path. */
  def syntheticRealMedia(documents: DataFrame): Dataset[MediaFile] =
    documents.select(col("doc_id")).as(Encoders.scalaLong).map { id =>
      val w = (id % 64 + 1).toInt * 4
      val h = (id % 48 + 1).toInt * 4
      val bytes = (id % 4) match {
        case 0 => MiniEncoder.png(w, h)
        case 1 => MiniEncoder.jpeg(w, h)
        case 2 => MiniEncoder.gif(w, h)
        case _ => MiniEncoder.wav(8000 + (id % 5).toInt * 8000, (id % 2).toInt + 1, 4)
      }
      val mt = if (id % 4 == 3) "audio" else "image"
      MediaFile(id, mt, if (id % 25 == 0) bytes.take(6) else bytes)
    }(mediaEnc)

  /** Probe REAL container headers per partition (same seam as
    * [[decodeMeta]]; corrupt/truncated rows mark invalid, never fail
    * the stage). */
  def probeMeta(media: Dataset[MediaFile]): Dataset[ProbedMeta] =
    media.mapPartitions { iter =>
      iter.map { m =>
        FormatProbe.probe(m.content) match {
          case Some((fmt, w, h, sr, ch)) =>
            ProbedMeta(m.doc_id, fmt, w, h, sr, ch, m.content.length, valid = true)
          case None =>
            ProbedMeta(m.doc_id, "unknown", 0, 0, 0, 0,
              if (m.content == null) 0 else m.content.length, valid = false)
        }
      }
    }(probedEnc)

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
