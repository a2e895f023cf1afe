package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming
import scala.jdk.CollectionConverters._

/** Streaming offset = the SET of shard-file names already served,
  * as a sorted JSON array. Names, not paths: the directory is fixed
  * by the source option, so offsets survive a mount-point move.
  * Size note for 100 TB: ~10^5 shard files at CC shard sizes ≈ a
  * few MB of offset JSON per checkpoint entry — acceptable for a
  * checkpoint log, but point one stream at one crawl/segment
  * directory rather than a whole archive root. */
private[sources] case class FileSetOffset(files: Vector[String])
    extends streaming.Offset {
  override def json(): String =
    files.map(n => "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
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
  * would silently lose its records otherwise). */
private[sources] class FileSetMicroBatchStream(
    path: String,
    accept: String => Boolean,
    makePartition: (String, String) => InputPartition, // (qualifiedFile, name)
    readerFactory: () => PartitionReaderFactory,
    maxFilesPerTrigger: Int)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {

  private val hadoopConf =
    new graft.SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
  @volatile private var drainTarget: Option[Vector[String]] = None

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
  override def initialOffset(): streaming.Offset = FileSetOffset(Vector.empty)
  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: engine calls latestOffset(start, limit)")
  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val seen = start.asInstanceOf[FileSetOffset].files.toSet
    val fresh = drainTarget.getOrElse(listNow()).filterNot(seen)
    val cap = limit match {
      case f: streaming.ReadMaxFiles => f.maxFiles()
      case _: streaming.ReadAllAvailable => Int.MaxValue
      case _ => maxFilesPerTrigger
    }
    FileSetOffset((seen.toVector ++ fresh.take(cap)).sorted)
  }
  override def reportLatestOffset(): streaming.Offset = FileSetOffset(listNow())
  override def deserializeOffset(json: String): streaming.Offset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    FileSetOffset(node.elements().asScala.map(_.asText).toVector.sorted)
  }
  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FileSetOffset].files.toSet
    val batch = end.asInstanceOf[FileSetOffset].files.filterNot(seen)
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
