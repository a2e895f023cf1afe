package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming
import scala.jdk.CollectionConverters._

/** Streaming offset = the set of shard-file names already served,
  * COMPACTED (r13): a high-water name `hwm` ("every name sorting at
  * or below this has been served") plus the explicit `extra` names
  * above/around it. Names, not paths: the directory is fixed by the
  * source option, so offsets survive a mount-point move.
  *
  * Why compacted: the r12 representation carried EVERY served name
  * in EVERY checkpoint entry — a years-long tail-follow of a growing
  * archive accumulated offsets without bound (~MBs at 10^5 files,
  * per entry). Names are served in sorted order, so once the
  * explicit set exceeds a threshold the OLDEST names fold into the
  * watermark and the offset stays O(threshold) forever.
  *
  * The contract the fold buys this with: a file arriving LATER with
  * a name sorting at or below the watermark is presumed served and
  * silently skipped. Shard names from our sinks and from crawl
  * segment layouts are monotone-ish (batch ids, timestamps), so the
  * kept tail (`CompactKeep` newest names stay explicit) covers any
  * realistic landing race; a deliberate BACKFILL of old names needs
  * a fresh checkpoint — documented at [[FileSetMicroBatchStream]].
  * Folding never touches names the current trigger is serving: only
  * the START offset's (already-committed) names fold, so
  * `planInputPartitions(start, end)` always finds the batch
  * explicitly in `end.extra`.
  *
  * JSON: `{"hwm": "..."|null, "extra": [...]}`; the r12 bare-array
  * form still deserializes (hwm = null), so existing checkpoints
  * resume unchanged. */
private[sources] case class FileSetOffset(hwm: Option[String],
    extra: Vector[String]) extends streaming.Offset {
  // set-ified once per offset instance: planInputPartitions filters a
  // batch against the START offset name-by-name, and a linear
  // `extra.contains` there was O(batch × extra) (r14, verdict)
  @transient private lazy val extraSet: Set[String] = extra.toSet
  def seen(name: String): Boolean =
    hwm.exists(name <= _) || extraSet(name)
  private def q(n: String) =
    "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  override def json(): String = {
    val h = hwm.map(q).getOrElse("null")
    extra.map(q).mkString(s"""{"hwm":$h,"extra":[""", ",", "]}")
  }
}

private[sources] object FileSetOffset {
  val empty: FileSetOffset = FileSetOffset(None, Vector.empty)

  def apply(files: Vector[String]): FileSetOffset = FileSetOffset(None, files)

  /** Fold the oldest committed names under the watermark once the
    * explicit set exceeds `maxNames`, keeping the newest `keep`
    * explicit. Only ever applied to a trigger's START offset — the
    * in-flight batch stays explicit by construction. */
  def compact(o: FileSetOffset, maxNames: Int, keep: Int): FileSetOffset =
    if (o.extra.size <= maxNames) o
    else {
      val sorted = o.extra.sorted
      val (fold, tail) = sorted.splitAt(sorted.size - keep)
      FileSetOffset(Some((o.hwm.toVector :+ fold.last).max), tail)
    }

  def fromJson(json: String): FileSetOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    if (node.isArray) // r12 checkpoints: the bare served-name array
      FileSetOffset(None, node.elements().asScala.map(_.asText).toVector.sorted)
    else {
      val h = Option(node.get("hwm")).filter(!_.isNull).map(_.asText)
      val e = Option(node.get("extra"))
        .map(_.elements().asScala.map(_.asText).toVector.sorted)
        .getOrElse(Vector.empty)
      FileSetOffset(h, e)
    }
  }
}

/** The shared tail-follow kernel for shard-file sources (r12) —
  * [[WarcSource]] and [[TarSource]] both ride it: new files matching
  * `accept` in a watched directory become micro-batch partitions
  * through the SAME per-file reader (and its pruning fast paths) as
  * the batch scan. Our sinks and foreign downloaders both land files
  * atomically via rename, so a listed file is a complete file.
  *
  * Admission control caps each batch at `maxFilesPerTrigger` new
  * files (engine-negotiated — an explicit ReadAllAvailable drains
  * everything); under `Trigger.AvailableNow` the drain target is
  * frozen once at prepare time, so a bounded run processes exactly
  * the files present at start and stops (the RpcMicroBatchStream
  * contract). Files are served in name order; a file that vanishes
  * between offer and plan fails the batch loudly (checkpoint replay
  * would silently lose its records otherwise).
  *
  * Offsets are COMPACTED (r13, [[FileSetOffset]]): beyond
  * `maxOffsetNames` explicit names the oldest committed names fold
  * into a high-water name, so checkpoint entries stay O(threshold)
  * over a years-long tail-follow. The contract: shard names must be
  * essentially monotone (true of our sinks' `batch=N/shard-NNNNN`
  * and crawl segment layouts) — a file landed later under a name at
  * or below the watermark is presumed served; backfilling old names
  * requires a fresh checkpoint. */
private[sources] class FileSetMicroBatchStream(
    path: String,
    accept: String => Boolean,
    makePartition: (String, String) => InputPartition, // (qualifiedFile, name)
    readerFactory: () => PartitionReaderFactory,
    maxFilesPerTrigger: Int,
    maxOffsetNames: Int = 1024)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {

  private val compactKeep = math.max(1, maxOffsetNames / 4)

  private val hadoopConf =
    new graft.SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
  @volatile private var drainTarget: Option[Vector[String]] = None
  // Backfill detection (r14, advisor): a file landing LATER with a
  // name at or below the watermark is presumed served and silently
  // skipped — correct under the monotone-naming contract, data loss
  // under an accidental backfill. The folded history itself sits
  // below the hwm in every listing, so "listed and below hwm" alone
  // would warn forever; instead the first listing of this run
  // baselines the below-hwm names (they ARE the folded history —
  // committed offsets only fold served names) and any below-hwm name
  // appearing in a LATER listing is a genuine late arrival, warned
  // loudly once. Restart re-baselines (a warning is advisory; the
  // contract fix is a fresh checkpoint, per the class doc).
  @volatile private var belowHwmBaseline: Set[String] = null

  private def listNow(): Vector[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    if (!fs.exists(p)) Vector.empty
    else {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).filter(s => s.isFile && accept(s.getPath.getName))
          .map(_.getPath.getName).sorted.toVector
      else Vector(st.getPath.getName)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    drainTarget = Some(listNow())
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxFiles(maxFilesPerTrigger)
  override def initialOffset(): streaming.Offset = FileSetOffset.empty
  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: engine calls latestOffset(start, limit)")
  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val committed = start.asInstanceOf[FileSetOffset]
    // set-ified: a 10^5-file listing against a 10^3-name extra would
    // otherwise pay O(listing × extra) contains() per trigger
    val extraSet = committed.extra.toSet
    val listed = drainTarget.getOrElse(listNow())
    committed.hwm.foreach { h =>
      val below = listed.filter(_ <= h).toSet
      if (belowHwmBaseline == null) belowHwmBaseline = below
      else {
        val late = below -- belowHwmBaseline
        if (late.nonEmpty) {
          println(s"[fileset] WARNING: ${late.size} file(s) arrived at $path " +
            s"with names at or below the committed watermark '$h' and will " +
            s"NOT be served (presumed already seen): ${late.toSeq.sorted.take(5).mkString(", ")}" +
            (if (late.size > 5) ", …" else "") +
            " — backfilling old names requires a fresh checkpoint " +
            "(see FileSetMicroBatchStream's monotone-naming contract)")
          belowHwmBaseline = belowHwmBaseline ++ late
        }
      }
    }
    val fresh = listed
      .filterNot(n => committed.hwm.exists(n <= _) || extraSet(n))
    val cap = limit match {
      case f: streaming.ReadMaxFiles => f.maxFiles()
      case _: streaming.ReadAllAvailable => Int.MaxValue
      case _ => maxFilesPerTrigger
    }
    // fold only the START's names — the batch added here must stay
    // explicit for planInputPartitions
    val base = FileSetOffset.compact(committed, maxOffsetNames, compactKeep)
    FileSetOffset(base.hwm, (base.extra ++ fresh.take(cap)).sorted)
  }
  override def reportLatestOffset(): streaming.Offset = FileSetOffset(listNow())
  override def deserializeOffset(json: String): streaming.Offset =
    FileSetOffset.fromJson(json)
  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val committed = start.asInstanceOf[FileSetOffset]
    val batch = end.asInstanceOf[FileSetOffset].extra.filterNot(committed.seen)
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    batch.map { n =>
      val f = new Path(p, n)
      if (!fs.exists(f)) throw new java.io.FileNotFoundException(
        s"shard $n vanished between offset and plan — refusing to silently drop its records")
      makePartition(fs.makeQualified(f).toString, n)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = readerFactory()
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}
