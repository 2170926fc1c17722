package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's serving layer (two Flask/pandas dashboards) re-expressed
  * as distributed Spark queries — SURVEY.md §2.3 A4-A9 and §2.5 O1-O5.
  *
  * The pandas code pulls the whole curated table into driver memory; here
  * every query stays a Catalyst plan: top-k compiles to
  * `TakeOrderedAndProject` (no global sort materialization), the
  * latest-window filter is an aggregate + 1-row broadcast semi-filter
  * (two scans, zero driver collect — survives an arbitrarily large input).
  */
object Serving {

  /** A4: per-day roll-up (dashboard/app.py:33-36). */
  def perDayRollup(daily: DataFrame, dateCol: String = "order_date",
                   amountCol: String = "total_amount"): DataFrame =
    daily.groupBy(col(dateCol))
      .agg(round(sum(col(amountCol)), 2).as("daily_total"))
      .orderBy(col(dateCol))

  /** A5/A6/O4: top-k keys by summed amount (dashboard/app.py:38-41).
    * Tie-broken by key so results are total-ordered and hash-stable. */
  def topK(df: DataFrame, keyCol: String, amountCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(round(sum(col(amountCol)), 2).as("revenue"))
      .orderBy(col("revenue").desc, col(keyCol))
      .limit(k)

  /** A7: latest-window leaderboard (streaming_dashboard/app.py:109-121):
    * keep only rows whose window equals the global max, then rank keys.
    * The max is computed as a 1-row aggregate joined back by broadcast —
    * Spark plans this without any driver round-trip and the big side is
    * scanned with the filter applied stream-side. */
  def latestWindowLeaderboard(df: DataFrame, windowCol: String,
                              keyCol: String, amountCol: String): DataFrame = {
    val latest = df.agg(max(col(windowCol)).as("latest_window"))
    df.join(broadcast(latest), col(windowCol) === col("latest_window"))
      .groupBy(col(keyCol))
      .agg(round(sum(col(amountCol)), 2).as("revenue"))
      .orderBy(col("revenue").desc, col(keyCol))
  }

  /** A8: window-health roll-up (streaming_dashboard/app.py:123-129):
    * per-window totals + distinct-key count, most recent first, capped. */
  def windowHealth(df: DataFrame, windowStartCol: String, windowEndCol: String,
                   keyCol: String, amountCol: String,
                   maxWindows: Int = 96): DataFrame =
    df.groupBy(col(windowStartCol), col(windowEndCol))
      .agg(
        round(sum(col(amountCol)), 2).as("total_revenue"),
        countDistinct(col(keyCol)).as("product_count"))
      .orderBy(col(windowStartCol).desc, col(windowEndCol).desc)
      .limit(maxWindows)

  /** A9: summary distincts (streaming_dashboard/app.py:140-144). */
  def summary(df: DataFrame, keyCol: String, windowStartCol: String,
              windowEndCol: String, tsCol: String): DataFrame =
    df.agg(
      countDistinct(col(keyCol)).as("products"),
      countDistinct(col(windowStartCol), col(windowEndCol)).as("windows"),
      max(col(tsCol)).as("latest"))

  /** A9 approximate variant: HyperLogLog++ distincts via
    * approx_count_distinct — constant memory per group regardless of
    * cardinality, the right summary shape at 100 TB (exact countDistinct
    * needs a full dedup shuffle). rsd defaults to Spark's 5%. */
  def summaryApprox(df: DataFrame, keyCol: String, windowStartCol: String,
                    windowEndCol: String, tsCol: String,
                    rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(keyCol), rsd).as("products"),
      approx_count_distinct(
        concat_ws(":", col(windowStartCol), col(windowEndCol)), rsd)
        .as("windows"),
      max(col(tsCol)).as("latest"))

  /** O2: multi-key mixed-direction sort + head-k (dashboard/app.py:43).
    * Catalyst plans `TakeOrderedAndProject` — per-partition top-k then a
    * single k-row merge on the driver, never a full global sort. */
  def sample(df: DataFrame, k: Int = 50)(sortKeys: (String, Boolean)*): DataFrame = {
    val ordering = sortKeys.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    df.orderBy(ordering: _*).limit(k)
  }

  /** Per-group top-k with TIES (dense_rank ≤ k on a value): unlike
    * [[topK]]'s row-limit semantics, every member of a tied value
    * class survives — "top 3 longest document lengths per language,
    * all docs at those lengths" — the semantics reports want when the
    * value, not an arbitrary tiebreak, is the ranking key.
    *
    * Scale shape: ranks are computed on the (group, value) COUNT
    * contraction, never the raw rows (dense_rank over raw rows ties
    * with itself row-by-row and funnels each group's full row set
    * through one window task; over the contraction the window input
    * is value-domain-bounded) — the q102 contraction discipline
    * applied to ranking. Output per surviving (group, value):
    * (group, rank, value, n_rows). */
  def topKValuesWithTies(df: DataFrame, groupCol: String,
                         valueCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val contracted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n_rows"))
    val byVal = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc)
    contracted
      .withColumn("rank", dense_rank().over(byVal))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col(valueCol), col("n_rows"))
      .orderBy(col(groupCol), col("rank"))
  }

  /** O5: distinct on a key subset (streaming_dashboard/app.py:142). */
  def distinctOn(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).dropDuplicates(cols)
}
