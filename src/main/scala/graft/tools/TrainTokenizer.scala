package graft.tools

import graft.GraftSession
import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** CLI: train a subword tokenizer from a documents parquet and save
  * its artifact — the release job a training-data pipeline runs
  * before any token counting or packing. Covers both shipped
  * families; prints a segmentation sample so a drive can eyeball the
  * result, then reloads the artifact and re-encodes to prove the
  * hand-off (train job → artifact → encode job) is lossless.
  *
  * Usage:
  *   runMain graft.tools.TrainTokenizer bpe <documentsParquet> <outDir> [numMerges]
  *   runMain graft.tools.TrainTokenizer unigram <documentsParquet> <outDir> [vocabSize]
  */
object TrainTokenizer {
  def main(args: Array[String]): Unit = {
    val kind = args(0)
    val in = args(1)
    val out = args(2)
    val spark = GraftSession.get()
    val docs = spark.read.parquet(in)
    val sample = docs.select(col("text")).limit(3)

    kind match {
      case "bpe" =>
        val n = args.lift(3).map(_.toInt).getOrElse(200)
        val merges = Bpe.trainMerges(docs, "text", n)
        Bpe.saveMerges(spark, merges, out)
        val back = Bpe.loadMerges(spark, out)
        require(back == merges, "artifact round-trip must be lossless")
        println(s"[tokenizer] bpe merges=${merges.size} -> $out")
        println(s"[tokenizer] first merges: ${merges.take(10).mkString(" ")}")
        Bpe.encodeDocs(sample, "text", back)
          .select(slice(col("bpe_symbols"), 1, 16).as("head"))
          .collect().foreach(r => println(s"[tokenizer] sample: ${r.getSeq[String](0).mkString(" ")}"))
      case "unigram" =>
        val v = args.lift(3).map(_.toInt).getOrElse(512)
        val vocab = Unigram.train(docs, "text", vocabSize = v)
        Unigram.saveVocab(spark, vocab, out)
        val back = Unigram.loadVocab(spark, out)
        require(back == vocab.sortBy { case (p, lp) => (-lp, p) },
          "artifact round-trip must be lossless")
        println(s"[tokenizer] unigram pieces=${vocab.size} -> $out")
        println(s"[tokenizer] top pieces: ${vocab.take(10).map(_._1).mkString(" ")}")
        Unigram.encodeDocs(sample, "text", back)
          .select(slice(col("unigram_pieces"), 1, 16).as("head"))
          .collect().foreach(r => println(s"[tokenizer] sample: ${r.getSeq[String](0).mkString(" ")}"))
      case other =>
        sys.error(s"unknown tokenizer kind '$other' (bpe|unigram)")
    }
    spark.stop()
  }
}
