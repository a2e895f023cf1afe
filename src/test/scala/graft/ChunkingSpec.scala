package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: windows, overlap, short tail, empty doc") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "only three words"),
      (3L, "   ")).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().groupBy(_.getLong(0))
    val d1 = chunks(1L).sortBy(_.getLong(1)).map(_.getString(2))
    assert(d1.toSeq === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10")) // overlap 1, short tail
    assert(chunks(2L).map(_.getString(2)).toSeq === Seq("only three words"))
    assert(!chunks.contains(3L)) // whitespace-only doc → no chunks
    // every token is covered by at least one chunk
    val covered = d1.flatMap(_.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("packing: offset bins are contiguous and budget-sized") {
    val docs = (1L to 100L).map(i => (i, Seq.fill(10)("t").mkString(" "))).toDF("doc_id", "text")
    val packed = Chunking.packSummary(docs, "doc_id", "text", seqTokens = 100L).collect()
    // 100 docs × 10 tokens / 100-token budget = 10 full sequences
    assert(packed.length === 10)
    packed.foreach { r => assert(r.getLong(1) === 10L && r.getLong(2) === 100L) }
    // contiguous doc ranges, no gaps
    val bounds = packed.sortBy(_.getLong(0)).map(r => (r.getLong(3), r.getLong(4)))
    assert(bounds.head._1 === 1L && bounds.last._2 === 100L)
    bounds.sliding(2).foreach { case Array((_, hi), (lo2, _)) => assert(lo2 === hi + 1) }
  }

  test("shard-partitioned packing: seq_id restarts per shard, window is partitioned") {
    val docs = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "even" else "odd", Seq.fill(10)("t").mkString(" ")))
      .toDF("doc_id", "shard", "text")
    val packed = Chunking.packOffsets(docs, "doc_id", "text", 50L, shardCol = Some("shard"))
    // the 100 TB contract: the cumsum window must carry a partition
    // spec (an unpartitioned Window.orderBy sorts the corpus on ONE
    // task — the WindowExec "No Partition Defined" hazard)
    assert(packed.queryExecution.executedPlan.toString.contains("windowspecdefinition(shard"))
    val rows = packed.collect().map(r =>
      (r.getAs[String]("shard"), r.getAs[Long]("doc_id")) -> r.getAs[Long]("seq_id")).toMap
    // per shard: 20 docs × 10 tokens / 50-token budget → 4 sequences of 5
    Seq("even", "odd").foreach { sh =>
      val ids = rows.keys.filter(_._1 == sh).map(_._2).toSeq.sorted
      assert(ids.size === 20)
      ids.zipWithIndex.foreach { case (id, idx) => assert(rows((sh, id)) === idx / 5) }
    }
    val summary = Chunking.packSummary(docs, "doc_id", "text", 50L, shardCol = Some("shard"))
      .collect()
    assert(summary.length === 8) // 4 sequences × 2 shards
    summary.foreach(r => assert(r.getAs[Long]("n_docs") === 5L &&
      r.getAs[Long]("sum_tokens") === 50L))
  }

  test("a straddling doc spills into its start bin") {
    // 3 docs of 7 tokens, budget 10: offsets 0,7,14 → bins 0,0,1
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val bins = Chunking.packOffsets(docs, "doc_id", "text", 10L)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(bins === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("packTokenBlocks: blocks span documents, EOS separates, final block short (r15)") {
    // shard A: docs of 3+2 tokens (+EOS each) = stream of 7 over
    // blockSize 4 → blocks [10 11 12 0] [20 21 0] (second short);
    // shard B: one 5-token doc → [30 31 32 33] [34 0]
    val docs = Seq(
      ("A", 1L, Seq(10L, 11L, 12L)), ("A", 2L, Seq(20L, 21L)),
      ("B", 3L, Seq(30L, 31L, 32L, 33L, 34L)))
      .toDF("shard", "doc_id", "toks")
    def run(df: org.apache.spark.sql.DataFrame) =
      Chunking.packTokenBlocks(df, "doc_id", "toks",
          blockSize = 4, eosId = 0L, shardCol = Some("shard"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getString(4))))
        .toMap
    val got = run(docs)
    // doc_starts: block-relative offsets where documents begin —
    // A/0 starts doc1 at 0; A/1 starts doc2 at 0 (p=4); B/1 is a
    // mid-document continuation (no starts)
    assert(got === Map(
      ("A", 0L) -> (("10 11 12 0", 4L, "0")),
      ("A", 1L) -> (("20 21 0", 3L, "0")),
      ("B", 0L) -> (("30 31 32 33", 4L, "0")),
      ("B", 1L) -> (("34 0", 2L, ""))))
    // partition-order invariance: the placement is pure arithmetic
    assert(run(docs.repartition(7)) === got)
  }

  test("packTokenBlocks: a null-token document contributes only EOS, later offsets unshifted (r16)") {
    // under non-ANSI size(null) = -1, so an uncoalesced null array
    // would shift every later document's positions by -1 while the
    // null doc emits no rows (r15 ADVICE); coalesced, the null doc
    // is an empty document: one EOS, exact offsets after it
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)), (2L, null: Seq[Long]), (3L, Seq(30L, 31L, 32L)))
      .toDF("doc_id", "toks")
    val got = Chunking.packTokenBlocks(docs, "doc_id", "toks",
        blockSize = 4, eosId = 0L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
    // stream: 10 11 12 0 | 0 | 30 31 32 0  (doc2 = its EOS alone)
    assert(got === Map(
      0L -> (("10 11 12 0", 4L, "0")),
      1L -> (("0 30 31 32", 4L, "0 1")),
      2L -> (("0", 1L, ""))))
  }
}
