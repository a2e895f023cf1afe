package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on a skewed key distribution") {
    // 10k rows, 95% on one hot key — the one-busy-contract shape
    val big = spark.range(10000)
      .select(when($"id" % 20 =!= 0, lit("0xhot")).otherwise(concat(lit("0xk"), $"id")).as("address"),
        $"id".as("payload"))
    val small = Seq(("0xhot", 1.5), ("0xk0", 2.0), ("0xk40", 3.0)).toDF("address", "price")
    val plain = big.join(small, Seq("address")).agg(
      count(lit(1)), sum($"payload" * $"price")).collect()(0)
    val salted = Skew.saltedJoin(big, small, Seq("address"), salts = 8)
      .agg(count(lit(1)), sum($"payload" * $"price")).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
    // hot key actually spreads across salts
    val saltSpread = big
      .withColumn("_s", pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter($"address" === "0xhot").select("_s").distinct().count()
    assert(saltSpread === 8)
  }

  test("outer salted join keeps unmatched rows exactly once") {
    val big = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val small = Seq(("a", 10)).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length === 3)
    assert(out(0).getInt(2) === 10)
    assert(out(1).isNullAt(2) && out(2).isNullAt(2))
  }

  test("small-side-preserving join types are refused, not silently duplicated") {
    val big = Seq(("a", 1)).toDF("k", "v")
    val small = Seq(("a", 10), ("z", 99)).toDF("k", "w")
    // right/full outer would emit small's unmatched ("z", 99) once per salt
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("unmatched small-side rows"), jt)
    }
    // left_semi stays legal and correct under salting
    assert(Skew.saltedJoin(big, small, Seq("k"), salts = 4,
      joinType = "left_semi").collect().length === 1)
  }
}
