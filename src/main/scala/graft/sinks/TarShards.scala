package graft.sinks

import graft.SerializableHadoopConf
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Tar bytes: plain POSIX ustar. Per member a 512-byte header
  * (name = `<key>.<ext>`; names over 100 bytes split across the
  * ustar `prefix` field at a '/' — see [[splitName]] — so keys up to
  * 255 bytes shard, longer ones refuse loudly; mode 0644, uid/gid 0,
  * MTIME 0 for byte-determinism, typeflag '0', magic
  * "ustar"+NUL+"00") + payload zero-padded to a 512 multiple;
  * archive ends with two zero blocks. So
  * `tar_bytes = Σ (512 + 512·ceil(len/512)) + 1024` — a closed
  * formula the q102 twin recomputes in SQL, and the archives
  * themselves list/extract byte-identically under GNU tar (the
  * foreign validator the spec shells out to).
  *
  * ALL I/O goes through the Hadoop `FileSystem` API resolved from
  * the output path + the driver's Hadoop configuration (shipped to
  * executors via [[graft.SerializableHadoopConf]]). That is what
  * makes this an export tier and not a local[32] toy: on a real
  * cluster `outDir` is `hdfs://…` or `s3a://…` and every executor's
  * shards land in the SAME directory; `file:` URIs and bare local
  * paths keep working unchanged (the specs drive both).
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
    pmod(graft.functions.Md5Family.md5Hash32(key.cast(StringType)),
      lit(nShards.toLong)).cast(IntegerType)

  /** Exact tar size of a member list: Σ(header + padded payload) +
    * the two-zero-block trailer. */
  def tarBytes(memberSizes: Seq[Long]): Long =
    memberSizes.map(s => BlockSize + ((s + BlockSize - 1) / BlockSize) * BlockSize).sum + 2L * BlockSize

  /** Shard count for a byte target: one combinable aggregate over the
    * EXACT per-member tar footprint (header + padded payload — the
    * [[tarBytes]] formula, not raw payload bytes, so sharding stays
    * honest for small-member corpora where padding dominates),
    * divided by `targetShardBytes`. This is how callers size real
    * exports — "aim for ~512 MB shards" — instead of guessing
    * nShards; hash sharding then balances in expectation, so actual
    * shards land within sampling noise of the target. */
  def shardsForTarget(df: DataFrame, payloadCol: String, targetShardBytes: Long): Int = {
    require(targetShardBytes >= BlockSize, "target must be at least one block")
    // NB Column./ is FRACTIONAL division — floor() makes it the
    // integer ceil-to-block the writer actually produces
    val total = df.select(
        sum(lit(BlockSize.toLong) +
          floor((length(col(payloadCol).cast(BinaryType)) + lit(BlockSize - 1))
            / lit(BlockSize)).cast("long") * lit(BlockSize.toLong)).as("b"))
      .collect()(0).getLong(0)
    math.max(1L, (total + targetShardBytes - 1) / targetShardBytes).toInt
  }

  /** [[write]] with a byte target instead of a shard count. */
  def writeSized(df: DataFrame, keyCol: String, payloadCol: String, ext: String,
      outDir: String, targetShardBytes: Long): DataFrame =
    write(df, keyCol, payloadCol, ext, outDir,
      shardsForTarget(df, payloadCol, targetShardBytes))

  /** ustar name placement for a member name: `(prefix, name)` byte
    * arrays. Names ≤100 bytes go in the name field alone. Longer
    * names use the POSIX `prefix` field (155 bytes at offset 345):
    * the stored full name is `prefix + '/' + name`, so a split point
    * must be an actual '/' in the member name — a >100-byte name
    * with no usable slash CANNOT be represented in ustar and refuses
    * (GNU/PAX long-name extension entries would break the
    * fixed-formula byte accounting and foreign minimal readers).
    * The split is the LEFTMOST '/' that leaves the remainder ≤100
    * bytes (deterministic, and maximizes headroom for sibling
    * members sharing the prefix). Splitting on the 0x2f byte is
    * UTF-8-safe: continuation bytes are ≥0x80. */
  private[sinks] def splitName(full: String): (Array[Byte], Array[Byte]) = {
    val b = full.getBytes("UTF-8")
    if (b.length <= 100) return (Array.emptyByteArray, b)
    require(b.length <= 256, // 155 + '/' + 100
      s"tar member name exceeds ustar's 255-byte prefix+name capacity: $full")
    var i = 0
    while (i < b.length) {
      if (b(i) == '/'.toByte && i <= 155 && (b.length - i - 1) <= 100 && i > 0 && i < b.length - 1) {
        return (java.util.Arrays.copyOfRange(b, 0, i),
          java.util.Arrays.copyOfRange(b, i + 1, b.length))
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"tar member name exceeds ustar's 100-byte field and has no '/' split " +
        s"with prefix<=155 and name<=100 bytes: $full")
  }

  private def headerFor(fullName: String, size: Long): Array[Byte] = {
    val (prefixB, nameB) = splitName(fullName)
    val h = new Array[Byte](BlockSize)
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
    System.arraycopy(prefixB, 0, h, 345, prefixB.length)
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
    * otherwise — checked per shard while writing) and payloads
    * non-null (a null would otherwise NPE anonymously inside a
    * task). Any `shard-*.tar` / `.shard-*.tar.tmp` already in
    * `outDir` is deleted first: a re-run over a smaller corpus must
    * not leave stale shards behind for `manifest()`/TarSource to
    * pick up. */
  def write(df: DataFrame, keyCol: String, payloadCol: String, ext: String,
      outDir: String, nShards: Int): DataFrame =
    writeMembers(df.withColumn("_graft_ext", lit(ext)),
      keyCol, "_graft_ext", payloadCol, outDir, nShards)

  /** Multi-extension form — REAL WebDataset samples: several member
    * files per key (`<key>.txt`, `<key>.json`, `<key>.bin`, …), the
    * ext taken from a COLUMN. Sharding stays keyed on `key` alone, so
    * every member of a sample lands in the same shard, ADJACENT
    * (members sort by (key, ext) within the shard) — the adjacency
    * contract WebDataset loaders (and [[graft.sources.WebDataset
    * .samples]]'s zero-shuffle grouping) rely on. `(key, ext)` pairs
    * must be unique; payloads non-null. */
  def writeMembers(df: DataFrame, keyCol: String, extCol: String,
      payloadCol: String, outDir: String, nShards: Int): DataFrame = {
    require(nShards >= 1)
    val spark = df.sparkSession
    val outPath = new Path(outDir)
    val driverFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(outPath)
    driverFs.listStatus(outPath).foreach { st =>
      val n = st.getPath.getName
      val stale = (n.startsWith("shard-") && n.endsWith(".tar")) ||
        (n.startsWith(".shard-") && n.endsWith(".tar.tmp"))
      if (stale) driverFs.delete(st.getPath, false)
    }
    val qualified = driverFs.makeQualified(outPath).toString
    val serConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rows = df.select(
        col(keyCol).cast(StringType).as("key"),
        col(extCol).cast(StringType).as("ext"),
        col(payloadCol).cast(BinaryType).as("payload"))
      .withColumn("shard", shardOf(col("key"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("key"), col("ext"))
    rows.select(col("shard"), col("key"), col("ext"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.STRING, Encoders.BINARY))
      .foreachPartition { it: Iterator[(Int, String, String, Array[Byte])] =>
        val dir = new Path(qualified)
        val fs = dir.getFileSystem(serConf.value)
        var cur = -1
        var out: java.io.OutputStream = null
        var tmp: Path = null
        var lastName: String = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // trailer
          out.close()
          val fin = new Path(dir, f"shard-$cur%05d.tar")
          if (fs.exists(fin)) fs.delete(fin, false) // overwrite semantics for re-runs
          if (!fs.rename(tmp, fin)) throw new java.io.IOException(s"rename to $fin failed")
          out = null
        }
        it.foreach { case (shard, key, ext, payload) =>
          if (shard != cur) {
            close()
            cur = shard
            lastName = null
            tmp = new Path(dir, f".shard-$cur%05d.tar.tmp")
            out = new java.io.BufferedOutputStream(fs.create(tmp, true))
          }
          val name = s"$key.$ext"
          require(name != lastName, s"duplicate member '$name' in shard $shard")
          require(payload != null, s"null payload for key '$key'")
          lastName = name
          out.write(headerFor(name, payload.length.toLong))
          out.write(payload)
          val pad = (BlockSize - payload.length % BlockSize) % BlockSize
          if (pad > 0) out.write(new Array[Byte](pad))
        }
        close()
      }
    manifest(spark, outDir)
  }

  /** Manifest of a shard directory by PARSING the written tars with
    * an independent reader (a streamed header walk — payloads are
    * `skip()`ed, never read, and nothing shard-sized is ever in
    * memory; real shards are hundreds of MB each):
    * `(shard, n_files, payload_bytes, tar_bytes)`. */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(st => st.getPath.getName.startsWith("shard-") && st.getPath.getName.endsWith(".tar"))
      .sortBy(_.getPath.getName)
    val rows = files.map { st =>
      val name = st.getPath.getName
      val shard = name.stripPrefix("shard-").stripSuffix(".tar").toInt
      val in = new java.io.BufferedInputStream(fs.open(st.getPath))
      var n = 0L
      var payload = 0L
      try {
        val header = new Array[Byte](BlockSize)
        var done = false
        while (!done) {
          var off = 0
          var eof = false
          while (off < BlockSize && !eof) {
            val r = in.read(header, off, BlockSize - off)
            if (r < 0) eof = true else off += r
          }
          if (eof || header.forall(_ == 0)) done = true
          else {
            val sizeField = new String(header, 124, 11, "US-ASCII").trim
            val size = java.lang.Long.parseLong(sizeField, 8)
            n += 1
            payload += size
            var left = ((size + BlockSize - 1) / BlockSize) * BlockSize
            while (left > 0) {
              val s = in.skip(left)
              if (s <= 0) {
                if (in.read() < 0) throw new java.io.EOFException(s"truncated tar $name")
                left -= 1
              } else left -= s
            }
          }
        }
      } finally in.close()
      org.apache.spark.sql.Row(shard, n, payload, st.getLen)
    }
    spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
      StructField("shard", IntegerType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("payload_bytes", LongType, nullable = false),
      StructField("tar_bytes", LongType, nullable = false))))
  }
}
