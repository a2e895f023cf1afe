package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right
  * row with the same key and `rightTime <= leftTime`.
  *
  * This is the reference's implied `logs × price` lookup — `price` is
  * keyed "as of block" (`schema.sql:79-80`) so valuing an event needs
  * the most recent price at or before the event's block. The reference
  * never writes the SQL (Postgres users would); we provide it as an
  * engine operator.
  *
  * Implementation: union-merge + running `last_value(ignoreNulls)`
  * window rather than an inequality join. An inequality/range join
  * explodes to O(|L|·|R|) pairs per key before filtering; the union
  * approach is one hash shuffle on the key plus a per-key sort —
  * O((|L|+|R|) log) and skew-tolerant, which is what survives at
  * 100 TB. Composed entirely from built-ins (Catalyst window exec),
  * no custom strategy needed.
  */
object AsOfJoin {

  /** @param left       fact rows (kept 1:1 in the output)
    * @param right      versioned dimension rows
    * @param keys       equi-join key column names (present in both)
    * @param leftTime   left ordering column name
    * @param rightTime  right ordering column name
    * @param valueCols  right columns to attach (default: all non-key,
    *                   non-time columns of `right`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String] = Seq.empty): DataFrame = {

    val vals =
      if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    require(
      vals.forall(!left.columns.contains(_)),
      s"as-of value columns ${vals.filter(left.columns.contains(_)).mkString(",")} collide with left columns; rename before joining")

    val ts = "_asof_ts"
    val src = "_asof_src" // 1 = right; sorts before left at equal time (<= semantics)

    val l = left
      .withColumn(ts, col(leftTime))
      .withColumn(src, lit(0))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as(ts)) ++ vals.map(c => col(c).as(s"_r_$c")): _*)
      .withColumn(src, lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(src).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = vals.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(src) === 0)
      .drop((vals.map(c => s"_r_$c") :+ ts :+ src): _*)
  }
}
