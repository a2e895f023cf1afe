package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-sequence preparation: document chunking (token windows
  * with overlap — the RAG/pretraining chunker) and offset-based
  * sequence packing (assign documents to fixed-token-budget training
  * sequences). Pure Column expressions; both operators have exact
  * DuckDB twins under the driver gate (q39/q40/q42).
  */
object Chunking {

  /** Token-window chunks of an ALREADY-MATERIALIZED tokens column
    * (staging contract per [[Text]]/[[Dedup.shinglesFromTokens]]):
    * windows of `chunkSize` tokens starting every `stride` tokens —
    * `stride < chunkSize` overlaps adjacent chunks (context
    * continuity), the trailing chunk may be short, an empty document
    * yields no chunks. */
  def chunksFromTokens(toks: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val starts = sequence(lit(1), greatest(size(toks), lit(1)), lit(stride))
    filter(
      transform(starts, st => concat_ws(" ", slice(toks, st, lit(chunkSize)))),
      c => length(c) > 0)
  }

  /** Documents → (doc_id, [carryCols...,] chunk_index, chunk_text,
    * chunk_tokens), one row per chunk. `carryCols` ride along unchanged
    * (e.g. the shard/source column the packer partitions on). At
    * 100 TB this is a pure map-side fan-out — no shuffle until a
    * downstream operator asks for one. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int, carryCols: Seq[String] = Seq.empty): DataFrame = {
    val carried = carryCols.map(col)
    df.select(col(idCol) +: carried :+ Text.tokens(col(textCol)).as("_toks"): _*)
      .select(col(idCol) +: carried :+
        chunksFromTokens(col("_toks"), chunkSize, stride).as("_chunks"): _*)
      .select(col(idCol) +: carried :+
        posexplode(col("_chunks")).as(Seq("chunk_index", "chunk_text")): _*)
      .select((col(idCol) +: carried) ++ Seq(
        col("chunk_index").cast(LongType).as("chunk_index"),
        col("chunk_text"),
        Text.tokenCount(col("chunk_text")).cast(LongType).as("chunk_tokens")): _*)
  }

  /** The packer's cumulative-offset window: partitioned by the shard
    * column when given, global otherwise. The partitioned form is the
    * 100 TB one — an unpartitioned `Window.orderBy` moves the whole
    * corpus to ONE task (Spark's own `WindowExec: No Partition
    * Defined` warning); packing across shard boundaries buys nothing
    * (a training sequence never spans shards by construction), so
    * sharding loses nothing and parallelizes everything. Keep the
    * global form for small, genuinely unsharded inputs only. */
  private def offsetWindow(shardCol: Option[String], orderCols: Seq[Column]): WindowSpec =
    shardCol.map(sc => Window.partitionBy(col(sc))).getOrElse(Window.partitionBy())
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)

  /** Offset packing: assign each document (in `idCol` order, per
    * shard when `shardCol` is given) to the training sequence its
    * cumulative-token START offset falls in — sequences hold
    * ~`seqTokens` tokens, a straddling document spills into its start
    * bin (deterministic, exactly reproducible in plain SQL — unlike
    * greedy bin packing, which needs sequential state).
    *
    * With `shardCol`, sequence identity is (shard, seq_id): seq_id
    * restarts per shard and the window parallelizes across shards —
    * the form to use at corpus scale. */
  def packOffsets(df: DataFrame, idCol: String, textCol: String,
      seqTokens: Long, shardCol: Option[String] = None): DataFrame = {
    val w = offsetWindow(shardCol, Seq(col(idCol)))
    val keyCols = shardCol.map(col).toSeq :+ col(idCol)
    df.select(keyCols :+ Text.tokenCount(col(textCol)).cast(LongType).as("n_tokens"): _*)
      .withColumn("_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("_off") / seqTokens.toDouble).cast(LongType))
      .drop("_off")
  }

  /** Packed-sequence summary: documents and token budget per
    * (shard,) sequence. */
  def packSummary(df: DataFrame, idCol: String, textCol: String,
      seqTokens: Long, shardCol: Option[String] = None): DataFrame = {
    val shard = shardCol.map(col).toSeq
    packOffsets(df, idCol, textCol, seqTokens, shardCol)
      .groupBy(shard :+ col("seq_id"): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .orderBy(shard :+ col("seq_id"): _*)
  }

  /** Pack ALREADY-CHUNKED rows (a `chunkDocuments` output or anything
    * with a token-count column) into fixed-budget sequences, cumsum
    * ordered by `orderCols` within `shardCol`. Appends `seq_id`. */
  def packChunks(chunks: DataFrame, tokenCol: String, seqTokens: Long,
      shardCol: Option[String], orderCols: Seq[String]): DataFrame =
    chunks
      .withColumn("_off", coalesce(
        sum(col(tokenCol)).over(offsetWindow(shardCol, orderCols.map(col))), lit(0L)))
      .withColumn("seq_id", floor(col("_off") / seqTokens.toDouble).cast(LongType))
      .drop("_off")
}
