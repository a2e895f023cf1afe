package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-sequence preparation: document chunking (token windows
  * with overlap — the RAG/pretraining chunker) and offset-based
  * sequence packing (assign documents to fixed-token-budget training
  * sequences). Pure Column expressions; both operators have exact
  * DuckDB twins under the driver gate (q39/q40).
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

  /** Documents → (doc_id, chunk_index, chunk_text, chunk_tokens),
    * one row per chunk. At 100 TB this is a pure map-side fan-out —
    * no shuffle until a downstream operator asks for one. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame =
    df.select(col(idCol), Text.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), chunksFromTokens(col("_toks"), chunkSize, stride).as("_chunks"))
      .select(col(idCol), posexplode(col("_chunks")).as(Seq("chunk_index", "chunk_text")))
      .select(col(idCol),
        col("chunk_index").cast(LongType).as("chunk_index"),
        col("chunk_text"),
        Text.tokenCount(col("chunk_text")).cast(LongType).as("chunk_tokens"))

  /** Offset packing: assign each document (in `idCol` order) to the
    * training sequence its cumulative-token START offset falls in —
    * sequences hold ~`seqTokens` tokens, a straddling document spills
    * into its start bin (deterministic, exactly reproducible in plain
    * SQL — unlike greedy bin packing, which needs sequential state).
    *
    * The global order-by window is the oracle-scale form; at corpus
    * scale run it per shard (group the window by a shard/source
    * column) — packing across shard boundaries buys nothing. */
  def packOffsets(df: DataFrame, idCol: String, textCol: String,
      seqTokens: Long): DataFrame = {
    val w = Window.orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), Text.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("_off") / seqTokens.toDouble).cast(LongType))
      .drop("_off")
  }

  /** Packed-sequence summary: documents and token budget per sequence. */
  def packSummary(df: DataFrame, idCol: String, textCol: String,
      seqTokens: Long): DataFrame =
    packOffsets(df, idCol, textCol, seqTokens)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .orderBy(col("seq_id"))
}
