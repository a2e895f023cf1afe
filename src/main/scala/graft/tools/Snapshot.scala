package graft.tools

import graft.GraftSession
import graft.sources.Snapshots

/** CLI: manifest snapshots over a logs table — commit a version, read
  * a pinned version (consistent under live ingest AND across
  * compaction, via MVCC retention), or vacuum bounded history.
  *
  * Usage: runMain graft.tools.Snapshot <tablePath> commit
  *        runMain graft.tools.Snapshot <tablePath> read [version]
  *        runMain graft.tools.Snapshot <tablePath> vacuum [keepVersions]
  */
object Snapshot {
  def main(args: Array[String]): Unit = {
    val Array(table, cmd) = args.take(2)
    val spark = GraftSession.get()
    cmd match {
      case "commit" =>
        val v = Snapshots.commit(spark, table)
        println(s"[snapshot] committed v$v table=$table")
      case "read" =>
        val v = args.lift(2).map(_.toLong)
          .orElse(Snapshots.latestVersion(spark, table))
          .getOrElse(sys.error(s"no snapshots at $table"))
        val df = Snapshots.read(spark, table, Some(v))
        println(s"[snapshot] v$v rows=${df.count()} valid=${Snapshots.isValid(spark, table, v)}")
      case "vacuum" =>
        val keep = args.lift(2).map(_.toInt).getOrElse(2)
        val (manifests, files) = Snapshots.vacuum(spark, table, keep)
        println(s"[snapshot] vacuum keep=$keep droppedManifests=$manifests deletedFiles=$files")
      case other => sys.error(s"unknown command '$other' (commit|read|vacuum)")
    }
    spark.stop()
  }
}
