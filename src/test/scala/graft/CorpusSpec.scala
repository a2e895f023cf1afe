package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus statistics and deterministic sampling operators. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("termFrequencies counts normalized whitespace tokens; empty docs vanish") {
    val tf = Corpus.termFrequencies(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(tf((1L, "the")) === 2L)
    assert(tf((1L, "cat")) === 1L)
    assert(tf((3L, "a")) === 2L)
    assert(!tf.keys.exists(_._1 == 4L)) // empty text contributes nothing
  }

  test("vocabulary and tfidf agree with driver-side math") {
    val tf = Corpus.termFrequencies(docs, "doc_id", "text")
    val vocab = Corpus.vocabulary(tf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(vocab("the") === ((2L, 3L)))  // docs 1,2; occurrences 2+1
    assert(vocab("cat") === ((2L, 2L)))
    assert(vocab("mat") === ((1L, 1L)))

    val n = 4L
    val got = Corpus.tfidf(tf, n)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(4))).toMap
    // tf * ln(N/df), computed independently here
    assert(got((1L, "the")) === 2.0 * math.log(4.0 / 2.0))
    assert(got((2L, "dog")) === 1.0 * math.log(4.0 / 2.0))
    assert(got((1L, "mat")) === 1.0 * math.log(4.0 / 1.0))
  }

  test("hashSample: deterministic, monotone in fraction, near-nominal rate") {
    val ids = spark.range(20000).toDF("id")
    val s20 = Corpus.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    val s20b = Corpus.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(s20 === s20b) // reproducible
    val s50 = Corpus.hashSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s50)) // nested by construction
    assert(math.abs(s20.size / 20000.0 - 0.2) < 0.02)
    assert(math.abs(s50.size / 20000.0 - 0.5) < 0.02)
    // a different seed draws a genuinely different sample
    val sSeed = Corpus.hashSample(ids, "id", 0.2, seed = 7).collect().map(_.getLong(0)).toSet
    assert(sSeed !== s20)
    // bounds
    assert(Corpus.hashSample(ids, "id", 0.0).count() === 0L)
    assert(Corpus.hashSample(ids, "id", 1.0).count() === 20000L)
    intercept[IllegalArgumentException](Corpus.hashSample(ids, "id", 1.5))
  }

  test("systematicSample keeps every k-th row per stratum in order") {
    val df = spark.range(100).selectExpr("id", "case when id % 3 = 0 then 'a' else 'b' end as s")
    val got = Corpus.systematicSample(df, "s", "id", every = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // stratum a = ids 0,3,6,…,99 (34 rows) → rows 1,6,11,… of that order
    assert(got("a") === (0 until 34 by 5).map(i => i * 3L))
    // stratum b = the other 66 ids in order → every 5th of those
    val bIds = (0L until 100L).filter(_ % 3 != 0)
    assert(got("b") === (0 until 66 by 5).map(bIds))
    assert(got("a").size + got("b").size === 7 + 14)
  }
}
