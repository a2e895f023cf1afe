package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** DSIR importance weighting: driver-math equality for log_weight
  * (the ln column the oracle can't gate), target-alignment ordering,
  * and deterministic Gumbel resampling. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: two topical docs; raw: one on-topic, one off-topic
  private val target = Seq(
    (0L, "data model data pipeline data"),
    (2L, "model pipeline data model")).toDF("doc_id", "text")
  private val raw = Seq(
    (1L, "data model pipeline data"),
    (3L, "banana banana kiwi banana kiwi")).toDF("doc_id", "text")

  test("log_weight matches driver math; on-target doc outweighs off-target") {
    val dim = 64
    val s = 1.0
    val out = Corpus.dsirWeights(raw, target, "doc_id", "text", dim = dim, smoothing = s)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    // driver reimplementation: hashed unigram+bigram counts
    def bucketOf(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(term.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim
    }
    def feats(text: String): Map[Long, Long] = {
      val toks = text.trim.split("\\s+").toSeq
      val terms = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      terms.groupBy(bucketOf).map { case (b, ts) => b -> ts.size.toLong }
    }
    val tHist = Seq("data model data pipeline data", "model pipeline data model")
      .map(feats).reduce((a, b) => (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    val rHist = Seq("data model pipeline data", "banana banana kiwi banana kiwi")
      .map(feats).reduce((a, b) => (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    val nt = tHist.values.sum.toDouble; val nr = rHist.values.sum.toDouble
    def lw(text: String): Double =
      feats(text).map { case (b, c) =>
        c * (math.log((tHist.getOrElse(b, 0L) + s) / (nt + s * dim)) -
          math.log((rHist.getOrElse(b, 0L) + s) / (nr + s * dim)))
      }.sum
    assert(math.abs(out(1L).getAs[Double]("log_weight") - lw("data model pipeline data")) < 1e-9)
    assert(math.abs(out(3L).getAs[Double]("log_weight") - lw("banana banana kiwi banana kiwi")) < 1e-9)
    assert(out(1L).getAs[Double]("log_weight") > out(3L).getAs[Double]("log_weight"),
      "on-target doc must outweigh off-target")
    // integer columns match the same driver histograms
    assert(out(1L).getAs[Long]("n_feats") === feats("data model pipeline data").values.sum)
  }

  test("dsirResample is deterministic per seed and returns exactly k rows") {
    val w = Corpus.dsirWeights(raw, target, "doc_id", "text", dim = 64)
    def ids(seed: Long) =
      Corpus.dsirResample(w, "id", k = 1, seed = seed).collect().map(_.getAs[Long]("id")).toSeq
    assert(ids(7L) === ids(7L))
    assert(Corpus.dsirResample(w, "id", k = 2, seed = 0L).count() === 2L)
    // with a huge weight gap, the on-target doc wins across seeds
    // often; at minimum the selection is always one of the raw ids
    assert(Set(1L, 3L).contains(ids(0L).head))
  }

  test("contract errors: non-positive smoothing and empty corpora refuse") {
    intercept[IllegalArgumentException] {
      Corpus.dsirWeights(raw, target, "doc_id", "text", smoothing = 0.0)
    }
    intercept[IllegalArgumentException] {
      Corpus.dsirWeights(raw, target.filter(lit(false)), "doc_id", "text")
    }
  }
}
