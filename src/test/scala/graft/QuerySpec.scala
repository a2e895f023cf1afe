package graft

import org.apache.spark.sql.functions._

/** Semantics the DuckDB oracle can't check: sketch accuracy, entry
  * smoke, and query-surface invariants. */
class QuerySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry flagship returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query name exists in queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("approx_count_distinct within 5% of exact (q30 contract)") {
    val approx = SparkEntry.queries("q30_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, o)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$flag parts: approx=$ap exact=$p")
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$flag orders: approx=$ao exact=$o")
    }
  }

  test("all queries are runnable at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }
}
