package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Aggregations => A, Cleansing => C, Serving => S}
import graft.Tables._

/** Driver contract — see SURVEY.md §7.
  *
  * Every entry in `queries` is one operator from the SURVEY.md §2 inventory
  * (or the §7 extension tier), expressed over the driver testdata tables
  * and paired — wherever ANSI-SQL-expressible — with a DuckDB oracle in
  * `oracleSql` whose column names AND aliases match the Spark output
  * exactly. Aggregated doubles are rounded and timestamps are emitted as
  * epoch seconds so the cross-engine hash compare is stable; every query
  * ends in a total ORDER BY (ties broken) on both sides.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** TPC-H-style revenue expression used in several queries. */
  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** 15-minute epoch bucket (seconds, grid-aligned) of a timestamp col. */
  private def bucket900(c: String) =
    (floor(unix_timestamp(col(c)) / 900) * 900).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== A1-A2 + O1: batch aggregation layer ==========================
    "q1_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(rev), 2).as("sum_disc_price"),
          round(sum(rev * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q2_kpis" -> ((s, d) => {
      A.kpis(
        lineitem(s, d).withColumn("amount", rev),
        keyCol = "l_partkey")
        .withColumnRenamed("distinct_products", "distinct_parts")
    }),

    // ===== A1 on the event stream table (daily revenue) =================
    "q3_daily_revenue" -> ((s, d) => {
      A.dailyRevenue(events(s, d).select(
        to_date(col("ts")).as("order_date"),
        col("event_type").as("product"),
        col("value").as("amount")))
    }),

    // ===== A3/T2: sliding-window revenue (batch form of the stream agg) =
    "q4_sliding_revenue" -> ((s, d) => {
      A.slidingRevenue(events(s, d).select(
        col("ts").as("order_ts"),
        col("event_type").as("product"),
        col("value").as("line_amount")))
        .orderBy(col("window_start"), col("product"))
    }),

    // ===== A5/O4: top-k with a broadcast dimension join =================
    "q5_top_products" -> ((s, d) => {
      val joined = lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .withColumn("amount", rev)
      S.topK(joined, "p_name", "amount", 10)
    }),

    // ===== 3-way join: revenue by nation ================================
    "q6_nation_revenue" -> ((s, d) => {
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ===== A4: per-day roll-up ==========================================
    "q7_daily_rollup" -> ((s, d) => {
      orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("daily_total"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("order_date"))
    }),

    // ===== A7: latest-window leaderboard ================================
    "q8_latest_leaderboard" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("bucket", bucket900("ts"))
        .withColumnRenamed("event_type", "product")
      S.latestWindowLeaderboard(e, "bucket", "product", "value")
    }),

    // ===== A8: window-health roll-up ====================================
    "q9_window_health" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("ws", bucket900("ts"))
        .withColumn("we", bucket900("ts") + 900)
      S.windowHealth(e, "ws", "we", "event_type", "value", maxWindows = 96)
    }),

    // ===== A9: summary distincts ========================================
    "q10_summary" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("ws", bucket900("ts"))
        .withColumn("we", bucket900("ts") + 900)
      S.summary(e, "event_type", "ws", "we", "ts")
        .select(
          col("products"), col("windows"),
          unix_timestamp(col("latest")).as("latest_epoch"))
    }),

    // ===== O2: multi-key mixed-direction sort + limit ===================
    "q11_sample" -> ((s, d) => {
      S.sample(orders(s, d), 50)(("o_orderdate", false), ("o_orderkey", true))
        .select(
          col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("order_epoch"),
          col("o_orderstatus"), col("o_totalprice"))
    }),

    // ===== O5: distinct =================================================
    "q12_distinct_flags" -> ((s, d) => {
      S.distinctOn(lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ===== P2-P13: the cleansing cascade, end-to-end ====================
    "q13_cleanse_events" -> ((s, d) => {
      // Feed the stream-shaped cleanser string columns, as Kafka JSON would.
      val raw = events(s, d).select(
        col("event_id"),
        col("ts").cast("string").as("event_time"),
        col("event_type").as("product"),
        col("value").cast("string").as("total_price"))
      C.cleanseStream(raw)
        .select(
          col("event_id"), col("product"),
          unix_timestamp(col("order_ts")).as("order_ts_epoch"),
          col("order_date"), col("line_amount"))
        .orderBy(col("event_id"))
    }),

    // ===== Window function: top-3 days per key ==========================
    "q14_top3_days" -> ((s, d) => {
      val daily = A.dailyRevenue(events(s, d).select(
        to_date(col("ts")).as("order_date"),
        col("event_type").as("product"),
        col("value").as("amount")))
      val w = Window.partitionBy(col("product"))
        .orderBy(col("total_amount").desc, col("order_date"))
      daily.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("order_date"), col("product"), col("total_amount"))
        .orderBy(col("product"), col("total_amount").desc, col("order_date"))
    }),

    // ===== A4 over the daily aggregate ==================================
    "q15_per_day_rollup" -> ((s, d) => {
      val daily = A.dailyRevenue(events(s, d).select(
        to_date(col("ts")).as("order_date"),
        col("event_type").as("product"),
        col("value").as("amount")))
      S.perDayRollup(daily)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_extendedprice),2) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_kpis" ->
      """SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS grand_total,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | count(*) AS "rows"
        |FROM lineitem""".stripMargin,

    "q3_daily_revenue" ->
      """SELECT CAST(ts AS DATE) AS order_date, event_type AS product,
        | round(sum(value),2) AS total_amount
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q4_sliding_revenue" ->
      """SELECT event_type AS product,
        | CAST(floor(epoch(ts)/900)*900 - n.n*900 AS BIGINT) AS window_start,
        | CAST(floor(epoch(ts)/900)*900 - n.n*900 + 3600 AS BIGINT) AS window_end,
        | round(sum(value),2) AS revenue
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS n) n
        |GROUP BY 1,2,3 ORDER BY window_start, product""".stripMargin,

    "q5_top_products" ->
      """SELECT p_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_name ORDER BY revenue DESC, p_name LIMIT 10""".stripMargin,

    "q6_nation_revenue" ->
      """SELECT n_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q7_daily_rollup" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        | round(sum(o_totalprice),2) AS daily_total, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_latest_leaderboard" ->
      """SELECT event_type AS product, round(sum(value),2) AS revenue
        |FROM events
        |WHERE CAST(floor(epoch(ts)/900) AS BIGINT) =
        |      (SELECT max(CAST(floor(epoch(ts)/900) AS BIGINT)) FROM events)
        |GROUP BY 1 ORDER BY revenue DESC, product""".stripMargin,

    "q9_window_health" ->
      """SELECT CAST(floor(epoch(ts)/900)*900 AS BIGINT) AS ws,
        | CAST(floor(epoch(ts)/900)*900 + 900 AS BIGINT) AS we,
        | round(sum(value),2) AS total_revenue,
        | count(DISTINCT event_type) AS product_count
        |FROM events GROUP BY 1,2 ORDER BY ws DESC, we DESC LIMIT 96""".stripMargin,

    "q10_summary" ->
      """SELECT count(DISTINCT event_type) AS products,
        | count(DISTINCT CAST(floor(epoch(ts)/900) AS BIGINT)) AS windows,
        | CAST(floor(epoch(max(ts))) AS BIGINT) AS latest_epoch
        |FROM events""".stripMargin,

    "q11_sample" ->
      """SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
        | o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderdate DESC, o_orderkey LIMIT 50""".stripMargin,

    "q12_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1,2""".stripMargin,

    "q13_cleanse_events" ->
      """SELECT event_id, event_type AS product,
        | CAST(floor(epoch(ts)) AS BIGINT) AS order_ts_epoch,
        | CAST(ts AS DATE) AS order_date,
        | round(value,2) AS line_amount
        |FROM events ORDER BY event_id""".stripMargin,

    "q14_top3_days" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS order_date, event_type AS product,
        |         round(sum(value),2) AS total_amount
        |  FROM events GROUP BY 1,2)
        |SELECT order_date, product, total_amount FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY product ORDER BY total_amount DESC, order_date) AS rn
        |  FROM daily)
        |WHERE rn <= 3
        |ORDER BY product, total_amount DESC, order_date""".stripMargin,

    "q15_per_day_rollup" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS order_date, event_type AS product,
        |         round(sum(value),2) AS total_amount
        |  FROM events GROUP BY 1,2)
        |SELECT order_date, round(sum(total_amount),2) AS daily_total
        |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
