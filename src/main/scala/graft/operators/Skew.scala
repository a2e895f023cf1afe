package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-join salting — for when a handful of hot keys (one
  * busy contract address emitting most logs is the canonical EVM case)
  * would pin a single reducer. AQE's skew-join split handles
  * sort-merge joins at runtime; this utility is the deterministic,
  * planner-independent form for hash joins and for engines/paths where
  * AQE can't see the skew (e.g. skew introduced after an exchange).
  *
  * Shape: the big (skewed) side gets a salt in [0, n) derived from the
  * full row hash; the small side is replicated n times (one copy per
  * salt). The join key becomes (keys…, salt), spreading each hot key
  * over n reducers at the cost of an n× blow-up of the SMALL side
  * only.
  */
object Skew {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // the small side is replicated once per salt, so any join type that
    // preserves UNMATCHED small-side rows (right/full outer) would emit
    // each of them `salts` times — refuse instead of silently duplicating
    val jt = joinType.toLowerCase.replace("_", "").stripSuffix("outer")
    require(Set("inner", "left", "leftsemi", "leftanti", "semi", "anti", "cross")(jt),
      s"saltedJoin: join type '$joinType' preserves unmatched small-side rows, " +
        "which salting replicates; use an unsalted join for right/full outer")
    val saltCol = "_graft_salt"
    val bigS = big.withColumn(
      saltCol,
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val smallS = small.withColumn(saltCol, explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, keys :+ saltCol, joinType).drop(saltCol)
  }
}
