package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trainable document-quality classifier — logistic regression over
  * hashing-trick bag-of-words features, trained IN Spark. This is
  * the fastText-linear-classifier shape of FineWeb/DCLM-style
  * quality filters (a linear model over token features deciding
  * keep/drop), expressed without any ML library: features, logits,
  * gradients and the serving dot product are all DataFrame
  * aggregations.
  *
  * Feature hashing: bucket(token) = first 8 hex chars of md5(token)
  * as an integer, mod `dim` — md5 because BOTH engines compute it
  * identically (the dedupLines key discipline), so the q100 twin can
  * re-derive the exact bucket of every token with
  * `('0x' || substr(md5(t),1,8))::bigint % dim`.
  *
  * Training scale shape: the feature table `(id, bucket, cnt)` is
  * one explode + combinable count, materialized once per training
  * run; each gradient-descent epoch is two combinable aggregations —
  * per-doc logits (features ⋈ broadcast weights, sum per id) and
  * per-bucket gradients (features ⋈ per-doc errors, sum per bucket)
  * — with ONLY dim-sized state ever reaching the driver (the
  * PQ-codebook collect class; default dim 2^16 ≈ 65k doubles).
  * Nothing is per-row imperative; epochs are a driver loop like
  * [[Bpe.trainMerges]] rounds.
  *
  * Serving: [[quantize]] rounds weights to integers at a documented
  * scale (the int8-serving convention), and [[scoreQuantized]]
  * computes the EXACT integer dot product Σ qw·cnt — deterministic
  * across engines, which is what lets q100 hash-gate the full
  * score path (hashing parity included). The float `sigmoid(z)`
  * convenience stays spec-territory (exp is not engine-identical —
  * the q58 ln rule).
  */
object QualityClassifier {

  /** Hash bucket of a token column: md5-prefix integer mod `dim`
    * (engine-portable by construction — see object scaladoc; the
    * Spark side rides the native digest-prefix expression, the twin
    * stays `('0x' || substr(md5(t),1,8))::bigint % dim`). */
  def bucket(tok: Column, dim: Int): Column =
    graft.functions.Md5Family.md5Hash32(tok) % dim

  /** Hashed bag-of-words features `(id, bucket, cnt)`. */
  def features(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    df.select(col(idCol).as("id"), Text.normalized(col(textCol)).as("_n"))
      .select(col("id"), explode(Text.tokens(col("_n"))).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("id"), bucket(col("_t"), dim).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Trained model: `weights(b)` = coefficient of bucket b, plus the
    * intercept. */
  final case class Model(weights: Array[Double], bias: Double, dim: Int)

  /** Train binary logistic regression by full-batch gradient descent:
    * per epoch, w ← w − lr·(Σ_docs (σ(w·x_d + b) − y_d)·x_d / n + λ·w).
    * `labelCol` must be 0/1. Returns the dense model. Two combinable
    * aggregations per epoch; dim-sized driver state (see scaladoc).
    * Plain full-batch GD — deterministic given the data, no sampling;
    * for the corpus sizes a quality filter trains on (labeled subset,
    * not the 100 TB corpus) this converges in tens of epochs. */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 1 << 16, epochs: Int = 50, learningRate: Double = 0.5,
      l2: Double = 1e-6): Model = {
    require(epochs >= 1 && dim >= 2)
    val spark = df.sparkSession
    val feats = features(df, idCol, textCol, dim)
      .localCheckpoint(true) // reused 2x/epoch; pin the one explode pass
                             // (released before returning - Pins discipline)
    val labels = df.select(col(idCol).as("id"),
      col(labelCol).cast(DoubleType).as("y"))
    val n = labels.count().toDouble
    require(n > 0, "empty training set")
    var w = new Array[Double](dim)
    var b = 0.0
    var epoch = 0
    while (epoch < epochs) {
      // sparse weight table for this epoch's logit join (broadcast)
      val wdf = spark.createDataFrame(
        spark.sparkContext.parallelize(w.zipWithIndex.collect {
          case (v, i) if v != 0.0 => org.apache.spark.sql.Row(i.toLong, v)
        }.toSeq, 4),
        StructType(Seq(StructField("bucket", LongType), StructField("w", DoubleType))))
      val errs = feats
        .join(broadcast(wdf), Seq("bucket"), "left")
        .groupBy(col("id"))
        .agg(sum(coalesce(col("w"), lit(0.0)) * col("cnt")).as("_z0"))
        .join(labels, Seq("id"), "right") // docs with zero tokens still contribute bias
        .select(col("id"),
          (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("_z0"), lit(0.0)) + lit(b))))
            - col("y")).as("err"))
      // per-bucket gradient + bias gradient
      val grad = feats
        .join(errs, Seq("id"))
        .groupBy(col("bucket"))
        .agg(sum(col("err") * col("cnt")).as("g"))
        .collect() // dim-bounded
      val biasGrad = errs.agg(sum(col("err"))).collect()(0).getDouble(0) / n
      val next = w.clone()
      var i = 0
      while (i < dim) { next(i) -= learningRate * l2 * next(i); i += 1 }
      grad.foreach { r =>
        val bi = r.getLong(0).toInt
        next(bi) -= learningRate * r.getDouble(1) / n
      }
      b -= learningRate * biasGrad
      w = next
      epoch += 1
    }
    graft.Pins.release(feats)
    Model(w, b, dim)
  }

  /** Quantize a model for serving: `qw = round(w·scale)` per bucket
    * (zero rows dropped), `qb = round(bias·scale)`. Integer weights
    * make the serving dot product EXACT — the property q100 gates. */
  def quantize(m: Model, scale: Double = 1e6): (Seq[(Long, Long)], Long) = {
    val rows = m.weights.iterator.zipWithIndex
      .map { case (v, i) => (i.toLong, math.round(v * scale)) }
      .filter(_._2 != 0L)
      .toSeq
    (rows, math.round(m.bias * scale))
  }

  /** Score docs with quantized weights: `logit_q = qb + Σ qw·cnt`
    * (exact integer arithmetic, order-independent), `n_feat_tokens` =
    * tokens that hit a nonzero-weight bucket. `weights` is a
    * `(bucket, qw)` frame — broadcast by default (vocab-bounded). */
  def scoreQuantized(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, qBias: Long, dim: Int,
      broadcastWeights: Boolean = true): DataFrame = {
    val wdf = if (broadcastWeights) broadcast(weights) else weights
    features(df, idCol, textCol, dim)
      .join(wdf, Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("qw").isNotNull, col("cnt")).otherwise(lit(0L))).as("n_feat_tokens"),
        (sum(coalesce(col("qw"), lit(0L)) * col("cnt")) + lit(qBias)).as("logit_q"))
  }
}
