package graft.tools

import graft.GraftSession
import graft.functions.Text
import graft.operators.Chunking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CLI: the training-data curation pipeline end-to-end — quality
  * filter → exact dedup → token-window chunking → sequence packing —
  * from a documents parquet to training-ready parquet outputs
  * (`<out>/chunks`: one row per chunk with its packed seq_id;
  * `<out>/sequences`: per-sequence summary). The same composition the
  * driver gates as q41/q40/q42.
  *
  * Packing runs PER SHARD (`shardCol`, default `source`): the
  * cumulative-offset window partitions on it, so no task ever sorts
  * the whole corpus (the unpartitioned-window scale hazard). Pass `-`
  * to pack globally — small inputs only. Sequence identity is then
  * (shard, seq_id).
  *
  * With a final `tar` argument, the surviving documents additionally
  * export as WebDataset-style shards (`<out>/tar/shard-NNNNN.tar`,
  * members `<doc_id>.txt` — [[graft.sinks.TarShards]]), the
  * container a training job streams. A final `warc` argument exports
  * them as Common Crawl-layout WARC conversion shards instead
  * (`<out>/warc/shard-NNNNN.warc.gz` + cdx —
  * [[graft.sinks.WarcShards]]), the container curation pipelines
  * exchange. Both may be given.
  *
  * Usage: runMain graft.tools.Curate <documentsParquet> <outDir> [minQuality] [chunkTokens] [stride] [seqTokens] [shardCol|-] [tar [nShards]] [warc [nShards]]
  */
object Curate {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val minQuality = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val chunkTokens = args.lift(3).map(_.toInt).getOrElse(256)
    val stride = args.lift(4).map(_.toInt).getOrElse(192)
    val seqTokens = args.lift(5).map(_.toLong).getOrElse(2048L)
    val shardArg = args.lift(6).getOrElse("source")
    val spark = GraftSession.get()

    val docs = spark.read.parquet(in)
    val shardCol = Some(shardArg).filter(c => c != "-" && docs.columns.contains(c))
    val kept = docs
      .withColumn("quality", Text.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("_fp", Text.fingerprint(col("text")))
    val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    val deduped = kept.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_fp")

    val chunks = Chunking.chunkDocuments(deduped, "doc_id", "text",
      chunkTokens, stride, carryCols = shardCol.toSeq)
    val packed = Chunking.packChunks(
      chunks.withColumnRenamed("chunk_tokens", "n_tokens"),
      "n_tokens", seqTokens, shardCol, Seq("doc_id", "chunk_index"))
    packed.write.mode("overwrite").parquet(s"$out/chunks")

    val seqKey = shardCol.map(col).toSeq :+ col("seq_id")
    val seqs = packed.groupBy(seqKey: _*)
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(seqKey: _*)
    seqs.write.mode("overwrite").parquet(s"$out/sequences")

    val (nd, nc, ns) = (deduped.count(), packed.count(), seqs.count())
    println(s"[curate] in=${docs.count()} kept=$nd chunks=$nc sequences=$ns " +
      s"minQuality=$minQuality chunk=$chunkTokens/$stride seq=$seqTokens " +
      s"shard=${shardCol.getOrElse("(global)")} → $out")

    if (args.contains("tar")) {
      val nShards = args.lift(args.indexOf("tar") + 1)
        .flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(4)
      val manifest = graft.sinks.TarShards.write(
        deduped.select(col("doc_id").cast("string").as("k"),
          col("text").cast("binary").as("p")),
        "k", "p", "txt", s"$out/tar", nShards)
      val m = manifest.orderBy(col("shard")).collect()
      println(s"[curate] tar shards=${m.length} files=${m.map(_.getLong(1)).sum} " +
        s"tar_bytes=${m.map(_.getLong(3)).sum} → $out/tar")
    }
    if (args.contains("warc")) {
      val nShards = args.lift(args.indexOf("warc") + 1)
        .flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(4)
      val manifest = graft.sinks.WarcShards.write(
        deduped.select(col("doc_id").cast("string").as("k"),
          concat(lit("urn:graft:doc/"), col("doc_id")).as("u"),
          col("text").cast("binary").as("p")),
        "k", "u", "p", s"$out/warc", nShards)
      val m = manifest.orderBy(col("shard")).collect()
      println(s"[curate] warc shards=${m.length} records=${m.map(_.getLong(1)).sum} " +
        s"payload_bytes=${m.map(_.getLong(2)).sum} → $out/warc")
    }
    spark.stop()
  }
}
