package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Trainable BPE tokenizer: training on the classic toy corpus,
  * encode mechanics, and doc-level boundary safety. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns the classic merges on the Sennrich toy corpus") {
    // word frequencies: low×5, lower×2, newest×6, widest×3 (the
    // canonical worked example — "es" then "est" merge first)
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = Bpe.trainMerges(df, "text", numMerges = 4)
    // round 1: "e s" occurs 9× (newest + widest) — the canonical first merge
    assert(merges.head === (("e", "s")))
    // round 2: "es t" 9×
    assert(merges(1) === (("es", "t")))
    // round 3: "est </w>" 9×
    assert(merges(2) === (("est", "</w>")))
    // encode uses the learned merges
    val enc = df.limit(1).select(
      Bpe.encode(lit("newest widest lowest"), merges).as("e"))
      .head().getSeq[String](0)
    assert(enc.containsSlice(Seq("est</w>")))
  }

  test("encode: symbol framing, boundary safety, count excludes </w>") {
    val merges = Seq(("t", "h"), ("th", "e"), ("the", "</w>"), ("a", "b"))
    val df = Seq((1L, "the theme ab"), (2L, ""), (3L, "a b")).toDF("id", "text")
    val got = df.select($"id",
        Bpe.encode($"text", merges).as("enc"),
        Bpe.tokenCount($"text", merges).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2)))).toMap
    // "the" fully merges incl. terminator; "theme" merges "the" but
    // keeps going only within the word; "ab" merges from (a,b)
    assert(got(1L)._1 === Seq("the</w>", "the", "m", "e", "</w>", "ab", "</w>"))
    assert(got(1L)._2 === 5) // the</w> counts once, two bare </w> excluded
    assert(got(2L)._1 === Seq.empty)
    assert(got(2L)._2 === 0)
    // "a b" as two WORDS must NOT merge across the </w> boundary
    assert(got(3L)._1 === Seq("a", "</w>", "b", "</w>"))
  }

  test("encodeDocs (loop path) is bit-identical to the expression encode " +
      "away from adjacent repeats") {
    val merges = Seq(
      ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"), ("table", "</w>"),
      ("r", "o"), ("ro", "w"), ("row", "</w>"),
      ("t", "h"), ("th", "e"), ("the", "</w>"),
      ("s", "c"), ("sc", "a"), ("sca", "n"), ("scan", "</w>"))
    val df = Seq(
      (1L, "the table row scan"),
      (2L, "tables rows the scanner"),
      (3L, "a stable throw chant"),
      (4L, ""),
      (5L, "  The   TABLE  row  "), // normalization shared by both paths
      (6L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val expr = df.select($"id", Bpe.encode($"text", merges).as("e"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    val loop = Bpe.encodeDocs(df, "text", merges, outCol = "e")
      .select($"id", $"e")
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(loop === expr)
    assert(loop(6L).isEmpty) // null text → null symbols on both paths
  }

  test("encodeDocs merges adjacent repeats Sennrich-style where the " +
      "expression form consumes the boundary") {
    val df = Seq((1L, "tata"), (2L, "aaaa")).toDF("id", "text")
    val mTa = Seq(("t", "a"))
    val mAa = Seq(("a", "a"))
    // expression form: the shared boundary space is consumed — only
    // alternate occurrences merge
    assert(df.filter($"id" === 1L).select(Bpe.encode($"text", mTa))
      .head().getSeq[String](0) === Seq("ta", "t", "a", "</w>"))
    assert(df.filter($"id" === 2L).select(Bpe.encode($"text", mAa))
      .head().getSeq[String](0) === Seq("aa", "a", "a", "</w>"))
    // loop form: Sennrich's answer
    assert(Bpe.encodeDocs(df.filter($"id" === 1L), "text", mTa, "e")
      .select($"e").head().getSeq[String](0) === Seq("ta", "ta", "</w>"))
    assert(Bpe.encodeDocs(df.filter($"id" === 2L), "text", mAa, "e")
      .select($"e").head().getSeq[String](0) === Seq("aa", "aa", "</w>"))
  }

  test("encodeDocs handles a 10k-merge vocabulary (merge-count independent)") {
    val active = Seq(("t", "h"), ("th", "e"), ("the", "</w>"))
    // 10k merges: the applicable prefix plus inert filler pairs over
    // symbols that never occur — the expression form would be a 10k-op
    // codegen tree; the loop path's work is bounded by word length
    val big = active ++ (0 until 9997).map(i => (s"zq$i", s"qz$i"))
    assert(big.size === 10000)
    val df = Seq((1L, "the theme thread"), (2L, "other text here")).toDF("id", "text")
    def run(m: Seq[(String, String)]) =
      Bpe.encodeDocs(df, "text", m, "e").select($"id", $"e")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(run(big) === run(active))
    assert(run(big)(1L).head === "the</w>")
  }

  test("merge list round-trips through the parquet vocabulary artifact") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = Bpe.trainMerges(df, "text", numMerges = 4)
    val path = java.nio.file.Files.createTempDirectory("bpe_vocab").toString + "/v"
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded === merges) // rank order restored exactly
    // an encode job using the artifact matches one using the in-memory list
    val docs = Seq((1L, "newest widest lowest")).toDF("id", "text")
    val a = Bpe.encodeDocs(docs, "text", merges, "e").select($"e").head().getSeq[String](0)
    val b = Bpe.encodeDocs(docs, "text", loaded, "e").select($"e").head().getSeq[String](0)
    assert(a === b)
    assert(a.contains("est</w>"))
  }

  test("doc-level application equals per-word application") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "</w>"))
    val docs = Seq((1L, "low lower slow")).toDF("id", "text")
    val whole = docs.select(Bpe.encode($"text", merges).as("e"))
      .head().getSeq[String](0)
    val perWord = Seq("low", "lower", "slow").flatMap { w =>
      spark.range(1).select(Bpe.encode(lit(w), merges).as("e"))
        .head().getSeq[String](0)
    }
    assert(whole === perWord)
  }
}
