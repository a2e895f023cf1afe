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

  /** TOKEN-EXACT packing (concat-and-split, r15) — the GPT-style
    * pretraining input [[packOffsets]] only approximates at document
    * granularity: per shard, documents in `idCol` order concatenate
    * into one token stream (an `eosId` after each document), cut into
    * fixed `blockSize` blocks. Blocks SPAN document boundaries by
    * construction — zero padding waste except the final partial block
    * per shard, emitted SHORT (`n_tokens < blockSize`) for the caller
    * to pad or drop; nothing is silently truncated.
    *
    * Output: `([shard,] block_id, token_ids, n_tokens, doc_starts)`
    * with `token_ids` a space-joined string (the q104 binary exporter
    * is the typed path; a string survives every comparator) and
    * `doc_starts` the block-relative offsets where documents BEGIN
    * (same encoding) — the attention-mask input: a trainer that must
    * not attend across document boundaries needs exactly these
    * positions, and recovering them downstream would mean re-scanning
    * for EOS tokens that legitimate text can also contain.
    *
    * Scale shape: one cumulative-offset window per shard (the
    * [[offsetWindow]] discipline — never global), then the per-token
    * explode this operator deliberately pays (the trainer needs the
    * actual tokens placed; there is no block-materializing shortcut)
    * feeding ONE hash aggregation keyed by (shard, block). Every
    * position is exact int64 arithmetic — `block_id = p div
    * blockSize` via the subtract-pmod form, no float division — so
    * output is engine- and partitioning-invariant (q146's hash). */
  def packTokenBlocks(df: DataFrame, idCol: String, tokensCol: String,
      blockSize: Int, eosId: Long,
      shardCol: Option[String] = None): DataFrame = {
    require(blockSize > 0, "packTokenBlocks: blockSize must be positive")
    val shard = shardCol.map(col).toSeq
    val w = offsetWindow(shardCol, Seq(col(idCol)))
    // A null tokensCol must not shift every LATER document's block
    // positions: under non-ANSI sessions size(null) = -1, which would
    // subtract one from the cumulative offset while the null doc
    // itself emits no rows — silent corruption. A null-token document
    // contributes exactly its EOS (same as an empty one).
    val withEos = df.select(shard :+ col(idCol) :+
      concat(coalesce(col(tokensCol).cast("array<bigint>"),
          array().cast("array<bigint>")),
        array(lit(eosId))).as("_te"): _*)
    val positioned = withEos
      .withColumn("_start",
        coalesce(sum(size(col("_te")).cast(LongType)).over(w), lit(0L)))
      .select(shard :+ col("_start") :+
        posexplode(col("_te")).as(Seq("_i", "_tok")): _*)
      .withColumn("_p", col("_start") + col("_i").cast(LongType))
    val b = lit(blockSize.toLong)
    val blockId = ((col("_p") - pmod(col("_p"), b)) / b).cast(LongType)
    positioned
      .withColumn("block_id", blockId)
      .groupBy(shard :+ col("block_id"): _*)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_p").as("p"), col("_tok").as("t")))),
          x => x.getField("t").cast("string")), " ").as("token_ids"),
        count(lit(1)).as("n_tokens"),
        // collect_list skips the nulls of non-start positions; blocks
        // with no document start yield "" (mid-document continuation)
        array_join(transform(
          array_sort(collect_list(when(col("_i") === 0, pmod(col("_p"), b)))),
          x => x.cast("string")), " ").as("doc_starts"))
  }
}
