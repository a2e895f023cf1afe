package graft.sinks

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard export — the container format
  * large-scale training jobs stream (a corpus becomes
  * `shard-00000.tar … shard-NNNNN.tar`, each tar holding
  * `<key>.<ext>` member files; readers sequential-scan shards and
  * group members by key). This is the hand-off OUT of the curation
  * pipeline: after dedup/filter/pack, ship the survivors to the
  * trainer as tars.
  *
  * Sharding: `shard = md5-prefix(key) mod nShards` — deterministic,
  * embarrassingly parallel, size-balanced in expectation. The
  * sequential-greedy size-balanced assignment real webdataset CLIs
  * use needs a global running byte sum (the selectByBudget
  * global-window hazard); hash sharding is the contract here and is
  * what a 1000-executor writer wants anyway. Within a shard, members
  * are written in ascending key order — byte-deterministic output.
  *
  * Tar bytes: plain ustar. Per member a 512-byte header (name =
  * `<key>.<ext>` truncated at 100 bytes — caller keys must fit,
  * checked; mode 0644, uid/gid 0, MTIME 0 for byte-determinism,
  * typeflag '0', magic "ustar"+NUL+"00") + payload zero-padded to a
  * 512 multiple; archive ends with two zero blocks. So
  * `tar_bytes = Σ (512 + 512·ceil(len/512)) + 1024` — a closed
  * formula the q102 twin recomputes in SQL, and the archives
  * themselves list/extract byte-identically under GNU tar (the
  * foreign validator the spec shells out to).
  *
  * Scale shape: one `repartition(nShards, shard)` shuffle; each task
  * writes the tar files of the shard ids that hash to it (streamed
  * member-by-member — nothing shard-sized is held in memory), via
  * temp-file + atomic rename (the staged-write discipline from
  * `sources/Logs`). Shard size is governed by nShards, which callers
  * size as `ceil(total_bytes / target_shard_bytes)`.
  */
object TarShards {

  private val BlockSize = 512

  /** Deterministic shard id of a key column: md5-prefix integer mod
    * nShards — the [[graft.operators.QualityClassifier.bucket]]
    * derivation, chosen over xxhash64 because both engines compute
    * md5 identically (xxhash64 is Spark-private — the q23-class
    * rows-only trap), so q102's twin re-derives every assignment. */
  def shardOf(key: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10).cast(LongType),
      lit(nShards.toLong)).cast(IntegerType)

  /** Exact tar size of a member list: Σ(header + padded payload) +
    * the two-zero-block trailer. */
  def tarBytes(memberSizes: Seq[Long]): Long =
    memberSizes.map(s => BlockSize + ((s + BlockSize - 1) / BlockSize) * BlockSize).sum + 2L * BlockSize

  private def headerFor(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar member name exceeds ustar's 100-byte field: $name")
    val h = new Array[Byte](BlockSize)
    val nameB = name.getBytes("UTF-8")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    def octal(value: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(value)
      val padded = ("0" * (len - 1 - s.length)) + s
      val b = padded.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
      h(off + len - 1) = 0
    }
    octal(0x1a4, 100, 8) // mode 0644
    octal(0, 108, 8) // uid
    octal(0, 116, 8) // gid
    octal(size, 124, 12)
    octal(0, 136, 12) // mtime 0: byte-deterministic archives
    h(156) = '0' // typeflag: regular file
    val magic = "ustar\u000000".getBytes("US-ASCII")
    System.arraycopy(magic, 0, h, 257, magic.length)
    // checksum: field treated as spaces during the sum
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Write `df`'s `(keyCol, payloadCol)` rows as
    * `<outDir>/shard-NNNNN.tar` archives, member names
    * `<key>.<ext>`. Returns the manifest
    * `(shard, n_files, payload_bytes, tar_bytes)` read back from the
    * written files. Keys must be unique (member names collide
    * otherwise — checked per shard while writing). */
  def write(df: DataFrame, keyCol: String, payloadCol: String, ext: String,
      outDir: String, nShards: Int): DataFrame = {
    require(nShards >= 1)
    val spark = df.sparkSession
    new java.io.File(outDir).mkdirs()
    val rows = df.select(
        col(keyCol).cast(StringType).as("key"),
        col(payloadCol).cast(BinaryType).as("payload"))
      .withColumn("shard", shardOf(col("key"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("key"))
    rows.select(col("shard"), col("key"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.BINARY))
      .foreachPartition { it: Iterator[(Int, String, Array[Byte])] =>
        var cur = -1
        var out: java.io.OutputStream = null
        var tmp: java.io.File = null
        var lastKey: String = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // trailer
          out.close()
          val fin = new java.io.File(tmp.getParentFile, f"shard-$cur%05d.tar")
          if (fin.exists()) fin.delete() // overwrite semantics for re-runs
          if (!tmp.renameTo(fin)) throw new java.io.IOException(s"rename to $fin failed")
          out = null
        }
        it.foreach { case (shard, key, payload) =>
          if (shard != cur) {
            close()
            cur = shard
            lastKey = null
            tmp = new java.io.File(outDir, f".shard-$cur%05d.tar.tmp")
            out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp))
          }
          require(key != lastKey, s"duplicate member key '$key' in shard $shard")
          lastKey = key
          out.write(headerFor(s"$key.$ext", payload.length.toLong))
          out.write(payload)
          val pad = (BlockSize - payload.length % BlockSize) % BlockSize
          if (pad > 0) out.write(new Array[Byte](pad))
        }
        close()
      }
    manifest(spark, outDir)
  }

  /** Manifest of a shard directory by PARSING the written tars with
    * an independent reader (header walk — not the writer's
    * bookkeeping): `(shard, n_files, payload_bytes, tar_bytes)`. */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("shard-") && f.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val rows = files.map { f =>
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar").toInt
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      var off = 0
      var n = 0L
      var payload = 0L
      var done = false
      while (!done && off + BlockSize <= bytes.length) {
        if (bytes.slice(off, off + BlockSize).forall(_ == 0)) done = true
        else {
          val sizeField = new String(bytes, off + 124, 11, "US-ASCII").trim
          val size = java.lang.Long.parseLong(sizeField, 8)
          n += 1
          payload += size
          off += BlockSize + (((size + BlockSize - 1) / BlockSize) * BlockSize).toInt
        }
      }
      org.apache.spark.sql.Row(shard, n, payload, f.length())
    }
    spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
      StructField("shard", IntegerType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("payload_bytes", LongType, nullable = false),
      StructField("tar_bytes", LongType, nullable = false))))
  }
}
