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
    // q30 projects the tolerance check itself; the booleans must hold
    // and the exact counts must equal an independent computation
    val rows = SparkEntry.queries("q30_approx_distinct")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} parts out of tolerance")
      assert(r.getBoolean(4), s"${r.getString(0)} orders out of tolerance")
    }
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (p, o) = exact(r.getString(0))
      assert(r.getLong(1) === p && r.getLong(3) === o, r.getString(0))
    }
  }

  test("all queries are runnable at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }
}
