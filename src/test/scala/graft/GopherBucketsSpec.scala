package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Gopher/MassiveText rule signals and CCNet-style score bucketing:
  * each rule trips on a purpose-built document, ratios are exact
  * int/int divisions, and ntile tiling is deterministic with
  * id-tie-breaks. */
class GopherBucketsSpec extends SparkSpec {
  import spark.implicits._

  // 60 words, all alphabetic, stopword-rich, no symbols/bullets
  private val goodText =
    (1 to 6).map(_ => "the cat and the dog have fun with all of that today")
      .mkString("\n")

  test("gopherSignals: a clean document passes every rule") {
    val df = Seq((1L, goodText)).toDF("doc_id", "text")
    val r = Corpus.gopherSignals(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") === 72L) // 12 words × 6 lines
    val mwl = r.getAs[Double]("mean_word_len")
    assert(mwl > 3.0 && mwl < 4.0)
    assert(r.getAs[Double]("alpha_word_ratio") === 1.0)
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(r.getAs[Double]("bullet_ratio") === 0.0)
    assert(r.getAs[Double]("ellipsis_ratio") === 0.0)
    assert(r.getAs[Long]("stop_hits") >= 2L)
    assert(r.getAs[Boolean]("keep"))
  }

  test("gopherSignals: each rule trips on its own violator") {
    val words51 = (1 to 51).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, goodText), // keeper
      (2L, "too short to have fifty words"), // word count
      (3L, goodText + " " + (1 to 20).map(_ => "### ### ###").mkString(" ")), // symbols
      (4L, (1 to 10).map(_ => "- bullet line of the have and that with be to of").mkString("\n")), // bullets
      (5L, (1 to 10).map(_ => "the line that trails off and have with of be to ...").mkString("\n")), // ellipses
      (6L, (1 to 60).map(i => s"$i$i").mkString(" ") + " the of"), // alpha ratio
      (7L, (1 to 60).map(i => s"word$i blue$i").mkString(" ")), // no stopwords
      (8L, "") // empty
    ).toDF("doc_id", "text")
    val out = Corpus.gopherSignals(df = docs, idCol = "doc_id", textCol = "text")
      .orderBy("id").collect()
    val keep = out.map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep")).toMap
    assert(keep(1L) === true)
    assert((2L to 8L).forall(i => keep(i) === false), s"expected 2..8 rejected: $keep")
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(byId(4L).getAs[Double]("bullet_ratio") > 0.9)
    assert(byId(5L).getAs[Double]("ellipsis_ratio") > 0.3)
    assert(byId(6L).getAs[Double]("alpha_word_ratio") < 0.8)
    assert(byId(7L).getAs[Long]("stop_hits") === 0L)
    assert(byId(8L).getAs[Long]("n_words") === 0L)
    assert(byId(8L).isNullAt(byId(8L).fieldIndex("mean_word_len")))
  }

  test("scoreBuckets: per-group ntile with deterministic tie-breaks") {
    val rows = (1L to 9L).map(i => (i, "en", 10.0 - i)) ++ // en: scores 9..1
      Seq((10L, "de", 5.0), (11L, "de", 5.0), (12L, "de", 5.0)) // de: all tied
    val out = Corpus.scoreBuckets(rows.toDF("id", "lang", "score"),
      "id", "lang", "score", k = 3).collect()
    val en = out.filter(_.getString(1) == "en")
      .map(r => r.getLong(0) -> (r.getAs[Int]("bucket"), r.getAs[String]("tier"))).toMap
    // highest scores first: ids 1..3 (scores 9,8,7) are the head tile
    assert((1L to 3L).forall(i => en(i) == (1, "head")))
    assert((4L to 6L).forall(i => en(i) == (2, "middle")))
    assert((7L to 9L).forall(i => en(i) == (3, "tail")))
    // all-tied group: id ascending decides the tiles
    val de = out.filter(_.getString(1) == "de")
      .map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    assert(de === Map(10L -> 1, 11L -> 2, 12L -> 3))
  }

  test("scoreBuckets: ascending ranks low scores as head (perplexity mode)") {
    val rows = (1L to 6L).map(i => (i, "en", i.toDouble))
    val out = Corpus.scoreBuckets(rows.toDF("id", "lang", "ppl"),
        "id", "lang", "ppl", k = 3, ascending = true)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("tier")).toMap
    assert(out(1L) === "head" && out(2L) === "head")
    assert(out(5L) === "tail" && out(6L) === "tail")
  }

  test("scoreBucketsApprox: full sample with distinct scores replays exact ntile") {
    val rows = (1L to 9L).map(i => (i, "en", 10.0 - i)) ++
      (10L to 15L).map(i => (i, "de", i.toDouble * 1.5))
    val df = rows.toDF("id", "lang", "score")
    val exact = Corpus.scoreBuckets(df, "id", "lang", "score", k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    val approx = Corpus.scoreBucketsApprox(df, "id", "lang", "score",
        k = 3, sampleFraction = 1.0)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    assert(approx === exact)
    // ascending mode too (perplexity orientation)
    val exactA = Corpus.scoreBuckets(df, "id", "lang", "score", k = 3,
        ascending = true)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    val approxA = Corpus.scoreBucketsApprox(df, "id", "lang", "score",
        k = 3, ascending = true, sampleFraction = 1.0)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    assert(approxA === exactA)
  }

  test("scoreBucketsApprox: plan has no window and no per-group sort of the corpus") {
    val df = (1L to 100L).map(i => (i, "en", i.toDouble)).toDF("id", "lang", "score")
    val out = Corpus.scoreBucketsApprox(df, "id", "lang", "score", k = 3,
      sampleFraction = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    // the only join is the broadcast of the (group, cuts) table
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("scoreBucketsApprox: sampled thresholds track exact tiers; unseen group is null") {
    // 3000 docs, deterministic score mixing so tiles are not trivial
    val rows = (1L to 3000L).map(i => (i, "en", ((i * 2654435761L) % 100003L).toDouble))
    val df = rows.toDF("id", "lang", "score")
    val exact = Corpus.scoreBuckets(df, "id", "lang", "score", k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    val approx = Corpus.scoreBucketsApprox(df, "id", "lang", "score", k = 3,
        sampleFraction = 0.2)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    val agree = exact.keys.count(i => exact(i) == approx(i))
    assert(agree.toDouble / exact.size > 0.9,
      s"tier agreement ${agree.toDouble / exact.size} too low")
    // every bucket value is in range and non-null for a sampled group
    assert(approx.values.forall(b => b >= 1 && b <= 3))

    // a group too small to land in the sample reports null, loudly —
    // id 5000 hashes outside the 0.1% sample window
    val tiny = (rows :+ ((5000L, "xx", 1.0))).toDF("id", "lang", "score")
    val nulls = Corpus.scoreBucketsApprox(tiny, "id", "lang", "score", k = 3,
        sampleFraction = 0.001)
      .filter(col("lang") === "xx").collect()
    assert(nulls.length === 1)
    assert(nulls(0).isNullAt(nulls(0).fieldIndex("bucket")))
    assert(nulls(0).isNullAt(nulls(0).fieldIndex("tier")))
  }

  test("scoreBucketsApprox: a NULL score gets a NULL bucket, never 'head'") {
    // r13 (advisor): the HOF comparison count drops null-predicate
    // elements, so a null score counted zero cuts and landed in
    // bucket 1 — silently promoting UNSCORED docs to the best tier.
    // Policy now matches the unsampled-group arm: loud NULL.
    val rows = (1L to 30L).map(i => (i, "en", i.toDouble)).toDF("id", "lang", "score")
    val withNull = rows.unionByName(
      Seq((999L, "en")).toDF("id", "lang").withColumn("score", lit(null).cast("double")))
    val out = Corpus.scoreBucketsApprox(withNull, "id", "lang", "score", k = 3,
        sampleFraction = 1.0)
      .filter(col("id") === 999L).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("bucket")))
    assert(out(0).isNullAt(out(0).fieldIndex("tier")))
    // uniform policy at k = 1 too
    val one = Corpus.scoreBucketsApprox(withNull, "id", "lang", "score", k = 1)
      .filter(col("id") === 999L).collect()
    assert(one(0).isNullAt(one(0).fieldIndex("bucket")))
    // scored rows unaffected by the null's presence
    val scored = Corpus.scoreBucketsApprox(withNull, "id", "lang", "score", k = 3,
        sampleFraction = 1.0)
      .filter(col("id") =!= 999L).collect().map(_.getAs[Int]("bucket"))
    assert(scored.forall(b => b >= 1 && b <= 3))
  }

  test("scoreBucketsApprox: k=1 is a single bucket; bad fraction refused") {
    val df = Seq((1L, "en", 1.0), (2L, "en", 2.0)).toDF("id", "lang", "score")
    val one = Corpus.scoreBucketsApprox(df, "id", "lang", "score", k = 1)
      .collect().map(_.getAs[Int]("bucket")).toSet
    assert(one === Set(1))
    intercept[IllegalArgumentException](
      Corpus.scoreBucketsApprox(df, "id", "lang", "score", sampleFraction = 0.0))
  }
}
