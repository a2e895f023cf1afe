package graft

import graft.functions.Abi
import graft.operators.{AsOfJoin, EventViews}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract: one named query per implemented operator from
  * SURVEY.md §2, each paired with equivalent DuckDB SQL in
  * [[oracleSql]] (the correctness gate compares both on sf0.01).
  *
  * Query-authoring rules (oracle-parity discipline):
  * - every query is TOTALLY ordered in both engines;
  * - double aggregation goes through decimal casts (exact, order-
  *   independent) — raw doubles appear only as pass-through columns;
  * - every computed column is aliased identically on both sides.
  */
object SparkEntry {

  private val TransferSig =
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

  /** Synthetic Transfer logs derived deterministically from `customer`
    * — lets the DuckDB oracle reproduce the decoded values without any
    * hex machinery (encode(x) then decode == x). */
  private def syntheticTransferLogs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(
      format_string("0x%040x", col("c_nationkey")).as("address"),
      lit(TransferSig).as("topic0"),
      format_string("0x%064x", col("c_custkey")).as("topic1"),
      format_string("0x%064x", col("c_custkey") * 7).as("topic2"),
      lit(null).cast(StringType).as("topic3"),
      format_string("0x%064x", col("c_custkey") * 31).as("data"),
      format_string("0xb%x", col("c_custkey")).as("block_hash"),
      col("c_custkey").as("block_number"),
      format_string("0xt%x", col("c_custkey")).as("transaction_hash"),
      lit(0L).as("transaction_index"),
      lit(0L).as("log_index"),
      lit(false).as("removed"),
      lit(null).cast(TimestampType).as("block_timestamp"))

  /** Flagship: the decoded-Transfer aggregation pipeline (codec + view
    * generator + topic0 filter + grouped agg) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_transfer_view_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2/A3 grouped aggregation with partial-agg split (TPC-H Q1 shape)
    "q01_agg_pricing_summary" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(BigDecimal(1)) - col("l_discount").cast(DecimalType(4, 2)))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // P4-P6 filter + projection, pushed to the parquet scan
    "q02_filter_project" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
          col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // J2 equi-joins (broadcast dim + shuffle fact) feeding a grouped agg
    "q03_join_agg_revenue" -> { (s, dir) =>
      val c = broadcast(Tables(s, dir, "customer"))
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(BigDecimal(1)) - col("l_discount").cast(DecimalType(4, 2)))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    },

    // O1 top-k: TakeOrderedAndProject, no full sort at scale
    "q04_topk_orders" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // A2 distinct aggregation
    "q05_distinct_parts" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    },

    // §2.5 window functions: row_number + running sum
    "q06_window_order_seq" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_total"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // §2.7 set operations: intersect / except over key sets
    "q07_set_ops_nations" -> { (s, dir) =>
      val cn = Tables(s, dir, "customer").select(col("c_nationkey").as("key")).distinct()
      val sn = Tables(s, dir, "supplier").select(col("s_nationkey").as("key")).distinct()
      cn.intersect(sn).withColumn("tag", lit("both"))
        .unionByName(cn.except(sn).withColumn("tag", lit("cust_only")))
        .select(col("tag"), col("key"))
        .orderBy(col("tag"), col("key"))
    },

    // J2 semi/anti joins (EXISTS / NOT EXISTS)
    "q08_semi_anti" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val semi = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_with_items"))
      val anti = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_without_items"))
      semi.crossJoin(anti)
    },

    // A2 hierarchical rollup over the region/nation dimension
    "q09_rollup_geo" -> { (s, dir) =>
      val r = Tables(s, dir, "region")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).as("acctbal_sum"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },

    // J1 as-of join: latest click at-or-before each purchase, per user
    "q10_asof_join" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_event_id"), col("ts").as("click_ts"))
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          valueCols = Seq("click_event_id", "click_ts"))
        .select(col("event_id"), col("user_id"), col("click_event_id"), col("click_ts"))
        .orderBy(col("event_id"))
    },

    // F1-F22 codec round-trip: encode keys as ABI words in Spark,
    // decode with the library; oracle passes the keys through.
    "q11_abi_roundtrip" -> { (s, dir) =>
      val word = (c: Column) => concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Abi.toUint64(2, word(col("o_orderkey"))).cast(LongType).as("decoded_key"),
          Abi.toUint32(2, word(col("o_custkey"))).as("decoded_cust"),
          Abi.toAddress(2, word(col("o_custkey"))).as("cust_addr"),
          Abi.toBool(2, word(col("o_custkey") % 2)).as("odd_cust"))
        .orderBy(col("o_orderkey"))
    },

    // P7/§2.9 the generated-view pipeline end-to-end over synthetic logs
    "q12_transfer_view_pipeline" -> { (s, dir) =>
      val transferDef = EventViews.referenceViews
        .find(_.viewName.startsWith("Transfer")).get
      EventViews.project(syntheticTransferLogs(s, dir), transferDef)
        .groupBy(col("contract_address"))
        .agg(count(lit(1)).as("n_transfers"),
          sum(col("amount")).as("total_amount"),
          max(col("to")).as("max_to_addr"))
        .orderBy(col("contract_address"))
    },

    // T1 tumbling block/time windows (batch rendering of the stream)
    "q13_tumbling_windows" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // §2.7 multi-chain unionByName pattern (db-create.sql:1-10 deploys)
    "q14_multichain_union" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val a = ev.filter(col("event_id") % 2 === 0).withColumn("chain", lit("chain_a"))
      val b = ev.filter(col("event_id") % 2 === 1).withColumn("chain", lit("chain_b"))
      a.unionByName(b)
        .groupBy(col("chain"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("chain"), col("event_type"))
    }
  )

  def oracleSql: Map[String, String] = Map(

    "q01_agg_pricing_summary" ->
      """select l_returnflag, l_linestatus,
        |  sum(cast(l_quantity as decimal(18,2))) as sum_qty,
        |  sum(cast(l_extendedprice as decimal(18,2))) as sum_base_price,
        |  sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2)))) as sum_disc_price,
        |  count(*) as count_order
        |from lineitem
        |group by l_returnflag, l_linestatus
        |order by l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """select l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |from lineitem
        |where l_shipdate >= timestamp '1995-01-01'
        |  and l_shipdate < timestamp '1996-01-01'
        |  and l_quantity < 25
        |order by l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg_revenue" ->
      """select c_mktsegment,
        |  sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2)))) as revenue,
        |  count(distinct o_orderkey) as n_orders
        |from lineitem
        |join orders on l_orderkey = o_orderkey
        |join customer on o_custkey = c_custkey
        |group by c_mktsegment
        |order by c_mktsegment""".stripMargin,

    "q04_topk_orders" ->
      """select o_orderkey, o_custkey, o_totalprice, o_orderdate
        |from orders
        |order by o_totalprice desc, o_orderkey
        |limit 10""".stripMargin,

    "q05_distinct_parts" ->
      """select l_returnflag,
        |  count(distinct l_partkey) as n_parts,
        |  count(distinct l_suppkey) as n_supps
        |from lineitem
        |group by l_returnflag
        |order by l_returnflag""".stripMargin,

    "q06_window_order_seq" ->
      """select o_custkey, o_orderkey,
        |  row_number() over w as rn,
        |  sum(cast(o_totalprice as decimal(18,2))) over (
        |    partition by o_custkey order by o_orderdate, o_orderkey
        |    rows between unbounded preceding and current row) as running_total
        |from orders
        |window w as (partition by o_custkey order by o_orderdate, o_orderkey)
        |order by o_custkey, rn""".stripMargin,

    "q07_set_ops_nations" ->
      """with cn as (select distinct c_nationkey as key from customer),
        |     sn as (select distinct s_nationkey as key from supplier)
        |select 'both' as tag, key from (select key from cn intersect select key from sn)
        |union all
        |select 'cust_only' as tag, key from (select key from cn except select key from sn)
        |order by tag, key""".stripMargin,

    "q08_semi_anti" ->
      """select
        |  (select count(*) from orders where exists
        |    (select 1 from lineitem where l_orderkey = o_orderkey)) as n_with_items,
        |  (select count(*) from orders where not exists
        |    (select 1 from lineitem where l_orderkey = o_orderkey)) as n_without_items""".stripMargin,

    "q09_rollup_geo" ->
      """select r_name, n_name, count(*) as n_cust,
        |  sum(cast(c_acctbal as decimal(18,2))) as acctbal_sum
        |from customer
        |join nation on c_nationkey = n_nationkey
        |join region on n_regionkey = r_regionkey
        |group by rollup(r_name, n_name)
        |order by r_name nulls first, n_name nulls first""".stripMargin,

    "q10_asof_join" ->
      """select p.event_id, p.user_id,
        |  c.event_id as click_event_id, c.ts as click_ts
        |from (select * from events where event_type = 'purchase') p
        |asof left join (select * from events where event_type = 'click') c
        |  on p.user_id = c.user_id and c.ts <= p.ts
        |order by p.event_id""".stripMargin,

    "q11_abi_roundtrip" ->
      """select o_orderkey,
        |  o_orderkey as decoded_key,
        |  o_custkey as decoded_cust,
        |  printf('0x%040x', o_custkey) as cust_addr,
        |  (o_custkey % 2 <> 0) as odd_cust
        |from orders
        |order by o_orderkey""".stripMargin,

    "q12_transfer_view_pipeline" ->
      """select printf('0x%040x', c_nationkey) as contract_address,
        |  count(*) as n_transfers,
        |  sum(cast(c_custkey as decimal(38,0)) * 31) as total_amount,
        |  max(printf('0x%040x', c_custkey * 7)) as max_to_addr
        |from customer
        |group by contract_address
        |order by contract_address""".stripMargin,

    "q13_tumbling_windows" ->
      """select time_bucket(interval '5 minutes', ts) as win_start, event_type,
        |  count(*) as n,
        |  sum(cast(value as decimal(18,4))) as total_value
        |from events
        |group by win_start, event_type
        |order by win_start, event_type""".stripMargin,

    "q14_multichain_union" ->
      """select case when event_id % 2 = 0 then 'chain_a' else 'chain_b' end as chain,
        |  event_type, count(*) as n
        |from events
        |group by chain, event_type
        |order by chain, event_type""".stripMargin
  )
}
