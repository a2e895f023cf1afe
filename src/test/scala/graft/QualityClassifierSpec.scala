package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Hashing-trick logistic regression: training must separate a
  * constructed two-class corpus (and improve with more epochs);
  * the quantized serving path must rank the classes; pins must not
  * leak ([[graft.Pins]] discipline). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val goodWords = Seq("insightful", "rigorous", "coherent", "structured", "evidence")
  private val spamWords = Seq("cheap", "pills", "winner", "clickbait", "xxx")

  private def corpus(n: Int) = (0 until n).map { i =>
    val r = new scala.util.Random(i)
    val (pool, y) = if (i % 2 == 0) (goodWords, 1) else (spamWords, 0)
    val text = Seq.fill(12)(pool(r.nextInt(pool.size))).mkString(" ") +
      " the and of common filler words"
    (i.toLong, text, y)
  }.toDF("doc_id", "text", "label")

  test("train separates classes; longer training separates at least as well; no pin leak") {
    val docs = corpus(40)
    val before = spark.sparkContext.getPersistentRDDs.size
    val m = QualityClassifier.train(docs, "doc_id", "text", "label",
      dim = 4096, epochs = 30, learningRate = 1.0)
    assert(spark.sparkContext.getPersistentRDDs.size === before, "train leaked a pin")
    val (qw, qb) = QualityClassifier.quantize(m)
    val wdf = qw.toDF("bucket", "qw")
    val scored = QualityClassifier.scoreQuantized(docs, "doc_id", "text", wdf, qb, 4096)
      .join(docs.select(col("doc_id").as("id"), col("label")), Seq("id"))
      .select(col("label"), col("logit_q")).collect()
    val good = scored.filter(_.getInt(0) === 1).map(_.getLong(1))
    val spam = scored.filter(_.getInt(0) === 0).map(_.getLong(1))
    assert(good.min > spam.max,
      s"classes must separate: good-min ${good.min} vs spam-max ${spam.max}")
    // monotone improvement in margin with more epochs (same data/seed)
    val m5 = QualityClassifier.train(docs, "doc_id", "text", "label",
      dim = 4096, epochs = 5, learningRate = 1.0)
    def margin(mm: QualityClassifier.Model): Long = {
      val (qw2, qb2) = QualityClassifier.quantize(mm)
      val sc = QualityClassifier.scoreQuantized(docs, "doc_id", "text",
          qw2.toDF("bucket", "qw"), qb2, 4096)
        .join(docs.select(col("doc_id").as("id"), col("label")), Seq("id"))
        .select(col("label"), col("logit_q")).collect()
      sc.filter(_.getInt(0) === 1).map(_.getLong(1)).min -
        sc.filter(_.getInt(0) === 0).map(_.getLong(1)).max
    }
    assert(margin(m) >= margin(m5), "more epochs must not shrink the margin here")
  }

  test("bucket hashing matches an independent md5 derivation; quantize drops zeros") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def expected(tok: String, dim: Int): Long = {
      val hex = md.digest(tok.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16) % dim
    }
    val got = Seq("hello", "the", "data", "xyzzy").toDF("t")
      .select(col("t"), QualityClassifier.bucket(col("t"), 4096).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, b) <- got) assert(b === expected(t, 4096), t)
    val (qw, _) = QualityClassifier.quantize(
      QualityClassifier.Model(Array(0.0, 1e-9, -0.5, 0.0), 0.0, 4))
    assert(qw === Seq((2L, -500000L))) // 1e-9 rounds to 0 and is dropped
  }
}
