package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Point-in-time snapshots over the partitioned logs table: a
  * manifest (`_graft_manifest/v<N>.json`, underscore-prefixed so
  * partition discovery never sees it) pins the exact data-file set of
  * a version; [[read]] loads precisely those files, so a long analytic
  * job sees ONE consistent table state while ingest keeps appending,
  * and older versions stay queryable (time travel across the ingest
  * history).
  *
  * Consistency contract — append-level MVCC, honestly scoped:
  * - concurrent APPENDS never disturb a pinned read (appends only add
  *   files; the manifest ignores them);
  * - COMPACTION/canonicalization rewrite files in place, which
  *   invalidates manifests taken before the rewrite — [[isValid]]
  *   detects it, and the operational order is: quiesce readers of old
  *   versions, compact, [[commit]] a fresh version. A full
  *   transactional table format (deletion vectors, retained
  *   tombstoned files) remains the documented upgrade path.
  *
  * Scale shape: a manifest is one listing + one small JSON write per
  * commit; reads plan from the manifest's file list (no directory
  * listing at all — at 10^5 partitions that beats even partition
  * pruning for repeat queries).
  */
object Snapshots {

  private val mapper = new ObjectMapper()

  private def manifestDir(tablePath: String) = new Path(s"$tablePath/_graft_manifest")
  private def fsOf(spark: SparkSession, tablePath: String): FileSystem =
    new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listDataFiles(fs: FileSystem, tablePath: String): Seq[String] = {
    val root = new Path(tablePath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("block_range="))
      .flatMap(d => fs.listStatus(d.getPath).toSeq)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => s"${f.getPath.getParent.getName}/${f.getPath.getName}")
      .sorted
  }

  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val fs = fsOf(spark, tablePath)
    val dir = manifestDir(tablePath)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .maxOption
  }

  /** Snapshot the table's CURRENT committed files as the next version;
    * returns it. Atomic: written to a tmp name, renamed in. Single
    * committer per table assumed (like [[Logs.compact]]); a concurrent
    * committer racing to the same version number is DETECTED — the
    * final manifest path is checked before the rename and the rename
    * result after it, so a lost manifest fails loudly instead of
    * silently (fs.rename-onto-existing behavior is
    * filesystem-dependent). */
  def commit(spark: SparkSession, tablePath: String): Long = {
    val fs = fsOf(spark, tablePath)
    val version = latestVersion(spark, tablePath).getOrElse(-1L) + 1
    publish(fs, tablePath, version, listDataFiles(fs, tablePath))
    version
  }

  /** The write-tmp-then-rename publish step, conflict-checked: if the
    * final manifest path appeared between version computation and
    * here (a concurrent committer), fail loudly rather than let
    * filesystem-dependent rename-onto-existing behavior silently drop
    * one manifest. */
  private[graft] def publish(fs: FileSystem, tablePath: String, version: Long,
      files: Seq[String]): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", version)
    val arr = node.putArray("files")
    files.foreach(arr.add)
    fs.mkdirs(manifestDir(tablePath))
    val tmp = new Path(manifestDir(tablePath), s".v$version.json.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsBytes(node))
    out.close()
    val fin = new Path(manifestDir(tablePath), f"v$version%09d.json")
    if (fs.exists(fin))
      throw new java.io.IOException(
        s"snapshot commit conflict: $fin already exists (concurrent committer?)")
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"snapshot commit: cannot publish $fin")
  }

  def files(spark: SparkSession, tablePath: String, version: Long): Seq[String] = {
    val fs = fsOf(spark, tablePath)
    val p = new Path(manifestDir(tablePath), f"v$version%09d.json")
    require(fs.exists(p), s"no snapshot v$version at $tablePath")
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    mapper.readTree(bytes).get("files").elements().asScala.map(_.asText).toSeq
  }

  /** Every pinned file still present (false after an in-place rewrite
    * such as compaction — re-[[commit]] to re-pin). */
  def isValid(spark: SparkSession, tablePath: String, version: Long): Boolean = {
    val fs = fsOf(spark, tablePath)
    files(spark, tablePath, version).forall(f => fs.exists(new Path(s"$tablePath/$f")))
  }

  /** Read exactly one version's file set (default: latest). `basePath`
    * keeps the `block_range` partition column derivable, so pruning
    * and the analytic column order behave like a live read. */
  def read(spark: SparkSession, tablePath: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, tablePath))
      .getOrElse(throw new IllegalStateException(s"no snapshots at $tablePath"))
    val paths = files(spark, tablePath, v).map(f => s"$tablePath/$f")
    if (paths.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), Logs.schema)
    else spark.read.option("basePath", tablePath).parquet(paths: _*)
      .select(Logs.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }
}
