package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation layer (SURVEY.md §2.3). All aggregates are Catalyst hash
  * aggregates — partial (map-side) + final automatically, so each one is a
  * single shuffle keyed on the group-by columns; at cluster scale that is
  * the minimum movement possible for these semantics.
  */
object Aggregations {

  /** A1: daily revenue — `groupBy(date, key).agg(round(sum(amount),2))`
    * (pipeline_batch.py:205-207), plus total sort O1 (line 207). */
  def dailyRevenue(df: DataFrame, dateCol: String = "order_date",
                   keyCol: String = "product",
                   amountCol: String = "amount"): DataFrame =
    df.groupBy(col(dateCol), col(keyCol))
      .agg(round(sum(col(amountCol)), 2).as("total_amount"))
      .orderBy(col(dateCol), col(keyCol))

  /** A2: global KPI triple (pipeline_batch.py:210-213). The reference runs
    * a *separate* `count()` action and stitches it in as a literal; we fold
    * the row count into the same single-pass aggregate — output identical,
    * one distributed job instead of two. */
  def kpis(df: DataFrame, amountCol: String = "amount",
           keyCol: String = "product"): DataFrame =
    df.agg(
      round(sum(col(amountCol)), 2).as("grand_total"),
      countDistinct(col(keyCol)).as("distinct_products"),
      count(lit(1)).as("rows"))

  /** A3/T2: sliding-window revenue — 1-hour windows every 15 minutes, each
    * event in 4 overlapping windows (streaming_sales_aggregator.py:266-277).
    * Works on both batch and streaming DataFrames; window bounds are emitted
    * as epoch seconds (grid-aligned, so no sub-second loss) to keep the
    * DuckDB oracle comparison free of cross-engine timestamp formatting. */
  def slidingRevenue(df: DataFrame, tsCol: String = "order_ts",
                     keyCol: String = "product",
                     amountCol: String = "line_amount",
                     windowDuration: String = "1 hour",
                     slideDuration: String = "15 minutes"): DataFrame =
    df.groupBy(
        window(col(tsCol), windowDuration, slideDuration).as("time_window"),
        col(keyCol))
      .agg(round(sum(col(amountCol)), 2).as("revenue"))
      .select(
        col(keyCol),
        unix_timestamp(col("time_window").getField("start")).as("window_start"),
        unix_timestamp(col("time_window").getField("end")).as("window_end"),
        col("revenue"))

  /** Revenue expression used across the TPC-H-shaped queries. */
  def revenue(price: Column, discount: Column): Column =
    price * (lit(1) - discount)

  /** Per-group z-score outlier detection: rows whose value lies more
    * than `z` sample standard deviations from their group's mean. The
    * group statistics are ONE hash aggregate (group count is bounded by
    * the key domain, not the data) broadcast back onto the stream — the
    * row side is never shuffled, so the op stays map-side per input
    * partition at any scale. The window-function formulation
    * (avg/stddev OVER (PARTITION BY grp)) computes the same thing but
    * shuffles every row by group key and stalls on skewed groups —
    * wrong shape for a 100 TB event stream. Emitted mu/sigma are
    * 6-dp-rounded for cross-engine stability; the filter compares
    * unrounded engine-native stats, deterministic except for values
    * within float-ulp of the z·sigma boundary (measure-zero for
    * continuous data). */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
               z: Double = 3.0): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("mu"),
        stddev_samp(col(valueCol)).as("sigma"))
    df.join(broadcast(stats), groupCol)
      .filter(abs(col(valueCol) - col("mu")) > lit(z) * col("sigma"))
      .withColumn("mu", round(col("mu"), 6))
      .withColumn("sigma", round(col("sigma"), 6))
  }

  /** Contraction-row threshold below which [[cumAndTot]] keeps the
    * direct keyed window even when `salt > 1`. A single-task sorted
    * running sum over ~2M rows costs about what the salted plan's
    * extra stages cost (measured at sf0.1: the salted rewrite of a
    * 600k-row cumsum was ~2× the direct window — fixed stage
    * overhead, not data volume); above it the funnel grows linearly
    * on ONE core while the salted plan stays parallel, so salting
    * wins and keeps winning. Conservative: the gate is on TOTAL
    * contraction rows while the funnel is really per-group — a
    * window the policy leaves unsalted never has more input than
    * this bound. */
  val AdaptiveSaltRows: Long = 2000000L

  /** The shared cumsum-over-contraction step of the median family
    * (weightedMedian / percentileBands / madOutliers / winsorizeStats):
    * append `_cum` (inclusive keyed cumsum of `_w` ordered by
    * `valueCol`) and `_tot` (group total of `_w`) to a
    * (group, value, _w) contraction.
    *
    * The direct keyed window is correct, but BOTH its windows funnel
    * each group's whole contraction through one task, and on a
    * NEAR-UNIQUE value domain (raw price cents) the contraction is
    * corpus-sized, so a 3-value group key means 3 tasks sorting n/3
    * rows each: the one shape that gets strictly worse with scale.
    * The salted plan routes the running sum through
    * [[SkewJoin.saltedCumSum]] (each group's order range split into
    * `salt` segments, cumsum per segment + per-segment offsets — tie
    * semantics proven row-identical at any salt) with `_tot` riding
    * the offsets pass for free (a tiny window over ≤ salt rows per
    * group), so NO window anywhere sees more than ~1/salt of a group.
    * Output rows are bit-identical either way: contraction rows are
    * distinct on (group, value), so the order key has no ties and
    * both formulations sum the same prefix sets.
    *
    * Strategy choice is ADAPTIVE (the AQE philosophy — runtime stats
    * pick the physical plan, semantics unchanged): the contraction is
    * materialized anyway, so its exact row count is a ~free job, and
    * the direct window wins under `saltMinRows` rows (fewer stages)
    * while the salted plan wins above it (parallelism). `salt ≤ 1`
    * forces the direct window; `saltMinRows = 0` forces salting.
    *
    * `materialize` eagerly localCheckpoints the contraction first
    * (pass false ONLY when the caller already checkpointed it): the
    * count and the salted path's consumers (segment bounds, local
    * cumsum, offsets) have structurally different subplans — exchange
    * reuse would not dedup them (the q137 lesson) and the corpus
    * would contract repeatedly. Checkpoint lifetime is caller-owned:
    * blocks free on ContextCleaner GC of the returned plan, and
    * localCheckpoint is not executor-loss-tolerant — on a real
    * cluster prefer reliable checkpointing for multi-hour jobs (same
    * caveat as the other checkpoint sites in this repo). */
  private def cumAndTot(contracted0: DataFrame, groupCol: String,
                        valueCol: String, salt: Int,
                        saltMinRows: Long,
                        materialize: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def direct(c: DataFrame): DataFrame = {
      val cum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy(col(groupCol))
      c.withColumn("_cum", sum(col("_w")).over(cum))
        .withColumn("_tot", sum(col("_w")).over(all))
    }
    if (salt <= 1) direct(contracted0)
    else {
      import org.apache.spark.storage.StorageLevel
      val contracted =
        if (materialize)
          contracted0.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        else contracted0
      if (saltMinRows > 0 && contracted.count() <= saltMinRows)
        direct(contracted)
      else
        SkewJoin.saltedCumSum(contracted, groupCol, valueCol, "_w", salt,
          outCol = "_cum", totCol = Some("_tot"))
    }
  }

  /** Exact weighted median per group — the lower weighted median: the
    * smallest value v whose inclusive cumulative weight reaches half
    * the group total (2·cum ≥ total). Spark has percentile/approx_
    * percentile but no WEIGHTED quantile; this is the windowed-cumsum
    * formulation. Both inputs are taken as INTEGER columns (quantize
    * values first — e.g. cents — per the integer-exact convention), so
    * the result is deterministic even under tied values: whether a tie
    * group qualifies depends only on its inclusive group-end cumsum,
    * never on the arbitrary order within the tie.
    *
    * Scale shape: the input is CONTRACTED before any window — an
    * ordinary hash aggregate (map-side partials) collapses the table to
    * one row per (group, value) with the weights summed — so the keyed
    * cumsum shuffles at most |distinct values| rows per group, never
    * the raw table. That bounds the window input by the VALUE DOMAIN —
    * which is only a bound when the domain is bounded: over near-unique
    * values (raw cents) the contraction is corpus-sized and a
    * low-cardinality group key still funnels ~n/groups rows through
    * single window tasks. `salt`/`saltMinRows` close that residual
    * funnel via [[cumAndTot]]'s adaptive strategy pick — identical
    * output under any setting; salt = 1 forces the direct-window
    * plan, saltMinRows = 0 forces the salted one. The lower-median
    * result is unchanged by contraction or salting: ties resolve on
    * the inclusive tie-group-end cumsum, which is exactly the
    * contracted row's cumulative weight. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String, salt: Int = 16,
                     saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    val contracted = df
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol)).as("_w"))
    cumAndTot(contracted, groupCol, valueCol, salt, saltMinRows,
        materialize = salt > 1)
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("_tot")).as("total_weight"))
  }

  /** Per-group discrete percentile bands (lower/type-1 percentiles of
    * an INTEGER value column at the given percents) — the daily
    * latency-report shape (p50/p90/p99 per day) under the repo's
    * integer-exact convention: the smallest v with 100·F(v) ≥ p·total
    * per percent, every comparison exact integer arithmetic.
    *
    * Output per group: (group, n, p<p1>, p<p2>, …) ordered by group.
    *
    * Scale shape: the [[weightedMedian]] contraction discipline — one
    * corpus-contracting aggregate to (group, value, weight), a keyed
    * cumsum over the contraction, one conditional-min per percent in a
    * single final aggregate. The contraction bounds the cumsum by the
    * VALUE DOMAIN — sufficient on its own only when the domain is
    * bounded; over near-unique values the contraction is corpus-sized
    * and a 3-value group key would still funnel ~n/3 rows per window
    * task, so `salt`/`saltMinRows` (via [[cumAndTot]]'s adaptive
    * strategy pick) split each group's cumsum across salt segments
    * once the contraction is big enough for the funnel to dominate —
    * identical output under any setting. */
  def percentileBands(df: DataFrame, groupCol: String, valueCol: String,
                      percents: Seq[Int] = Seq(50, 90, 99),
                      salt: Int = 16,
                      saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      "percents must be in (0, 100]")
    val contracted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_w"))
    val cums = cumAndTot(contracted, groupCol, valueCol, salt, saltMinRows,
      materialize = salt > 1)
    val bands = percents.map(p =>
      min(when(col("_cum") * 100 >= lit(p) * col("_tot"), col(valueCol)))
        .as(s"p$p"))
    cums.groupBy(col(groupCol))
      .agg(max(col("_tot")).as("n"), bands: _*)
      .orderBy(col(groupCol))
  }

  /** Calendar gap-fill: densify a per-day aggregate to EVERY day in
    * its observed [min, max] range, missing days carried as zero rows
    * — the step between a sparse aggregate and anything that assumes
    * a contiguous time axis (trailing windows, day-over-day deltas,
    * charting). Spark has no native gap-fill; this is the
    * sequence-spine idiom: explode one min→max `sequence` into the
    * day spine (ONE row's array — bounded by calendar cardinality,
    * ~37k rows even for a century) and left-join the aggregate onto
    * it, zero-coalescing `fillCols`.
    *
    * Scale: the input is already a per-day contraction; the spine is
    * calendar-sized; the join is day-keyed between two tiny frames.
    * Nothing here ever sees raw-event cardinality. */
  def gapFillDays(daily: DataFrame, dayCol: String,
                  fillCols: Seq[String]): DataFrame = {
    val spine = daily
      .agg(min(col(dayCol)).as("_lo"), max(col(dayCol)).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as(dayCol))
    val filled = fillCols.map(c => coalesce(col(c), lit(0L)).as(c))
    spine.join(daily, Seq(dayCol), "left")
      .select(col(dayCol) +: filled: _*)
      .orderBy(col(dayCol))
  }

  /** Per-group robust outlier screen: lower median, MAD (median
    * absolute deviation, lower), and how many rows sit beyond
    * `k`·MAD of the median — the outlier detector that, unlike
    * mean/std z-scores, is not dragged by the outliers it is looking
    * for (50% breakdown point vs 0). Takes an INTEGER value column
    * (quantize first, the repo convention), so both medians and every
    * comparison are exact integer arithmetic — bit-identical
    * cross-engine, no float thresholds.
    *
    * Output per group: (group, n, median, mad, n_outliers,
    * pct_outliers).
    *
    * Known MAD edge: a group where the majority value is constant has
    * MAD = 0, making EVERY deviating row an "outlier" (k·0 = 0) — the
    * standard MAD pathology, reported as-is rather than papered over;
    * consumers treating mad = 0 specially should branch on the column.
    *
    * Scale shape: ONE corpus pass — the (group, value) count
    * contraction feeds everything downstream: the median cumsum runs
    * on it, the deviation frame is the SAME contraction re-keyed by
    * |v − med| (weights summed — no second corpus scan), the MAD
    * cumsum runs on that, and the final stats aggregate the deviation
    * contraction, never the raw rows. Every cumsum rides the
    * [[weightedMedian]] contraction discipline (bounded by group ×
    * value-domain cardinality) and, once past `saltMinRows`, the
    * [[cumAndTot]] segment split — on near-unique values (raw price
    * cents) the contraction is corpus-sized, and without the salt each
    * median paid a ~n/groups single-task window sort, TWICE (this was
    * the round-7 bench's one genuine scale-killer shape; identical
    * output either way, pass salt = 1 for the direct windows).
    * Per-group scalars move as broadcast one-row-per-group frames.
    * Both contractions are CHECKPOINTED: each has multiple structurally
    * different consumers, and Spark's exchange reuse only dedups
    * identical subplans — without the materialization the corpus scan
    * ran three times (verified in the formatted plan), exactly the
    * cost this shape exists to avoid. (The first formulation re-joined
    * the raw table for deviations and again for the final count —
    * three corpus-sized executions, ~4× slower at 6M rows, for
    * identical output.) Checkpoint lifetime is caller-owned — blocks
    * free on ContextCleaner GC of the returned plan; see
    * [[cumAndTot]]'s cluster caveat. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 3, salt: Int = 16,
                  saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def lowerMedian(contracted: DataFrame, vCol: String, out: String) =
      cumAndTot(contracted, groupCol, vCol, salt, saltMinRows,
        materialize = false)
        .filter(col("_cum") * 2 >= col("_tot"))
        .groupBy(col(groupCol)).agg(min(col(vCol)).as(out))
    val c1 = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_w"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val med = lowerMedian(c1, valueCol, "_med")
    val devC = c1.join(broadcast(med), groupCol)
      .groupBy(col(groupCol),
        abs(col(valueCol) - col("_med")).as("_d"))
      .agg(sum(col("_w")).as("_w"), max(col("_med")).as("_med"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val mad = lowerMedian(devC, "_d", "_mad")
    devC.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(sum(col("_w")).as("n"),
        max(col("_med")).as("median"),
        max(col("_mad")).as("mad"),
        sum(when(col("_d") > lit(k.toLong) * col("_mad"), col("_w"))
          .otherwise(0L)).as("n_outliers"))
      .select(col(groupCol), col("n"), col("median"), col("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") * 100 / col("n"), 4)
          .as("pct_outliers"))
  }

  /** Per-group Gini concentration of an INTEGER value column — "how
    * unequal is customer spend within each nation", the inequality
    * screen for revenue concentration, data-source dominance, token
    * ownership. G = (2·Σ i·xᵢ)/(n·Σ xᵢ) − (n+1)/n over each group's
    * ascending-ranked values; 0 = perfectly even, →1 = one member owns
    * everything.
    *
    * No per-row ranking anywhere (the keySkew closed form, per group):
    * all rows tied at value v collapse to one (group, v, m) contraction
    * row, and a tie block of m members ending at inclusive cumulative
    * count `cum` contributes v·(m·cum − m(m−1)/2) to Σ i·xᵢ — an
    * arithmetic-series sum independent of intra-block order. The
    * cumulative count rides [[cumAndTot]], so the per-group cumsum is
    * adaptive-salted like the median family. Exact integer aggregate
    * sums (decimal(38,0) for the rank-weighted sum — v·m·cum exceeds
    * int64 around v ~ 10⁷ cents × n ~ 10⁹ rows; the PER-ROW product is
    * bounded by v·m·cum ≤ ~9·10¹⁸ and ANSI mode fails loudly past it),
    * one double expression at the end, rounded to 6 dp.
    *
    * Output per group: (group, n, total, gini). */
  def giniByGroup(df: DataFrame, groupCol: String,
                  valueCol: String, salt: Int = 16,
                  saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    val contracted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_w"))
    cumAndTot(contracted, groupCol, valueCol, salt,
        saltMinRows, materialize = salt > 1)
      .groupBy(col(groupCol))
      .agg(max(col("_tot")).as("n"),
        sum(col(valueCol) * col("_w")).as("total"),
        sum((col(valueCol) *
            (col("_w") * col("_cum") -
              expr("(_w * (_w - 1)) div 2"))).cast("decimal(38,0)"))
          .as("_iwsum"))
      .select(col(groupCol), col("n"), col("total"),
        when(col("total") > 0,
          round(lit(2.0) * col("_iwsum").cast("double") /
            (col("n").cast("double") * col("total")) -
            (col("n") + lit(1)).cast("double") / col("n"), 6))
          .otherwise(lit(null).cast("double")).as("gini"))
      .orderBy(col(groupCol))
  }

  /** Exact equal-width histogram of an INTEGER value column: `bins`
    * buckets spanning the observed [min, max], integer bucket
    * arithmetic (bin = (v − lo)·bins div (hi − lo + 1), the
    * saltedCumSum segment formula — no float edges, no boundary
    * epsilon), each output row carrying its inclusive integer bounds.
    * The exact companion of approx percentile sketches when the
    * distribution itself is the deliverable (dashboards, drift
    * baselines for [[graft.ext.Profiling.psiDrift]]).
    *
    * Scale: one row per input row map-side to (bin), one hash
    * aggregate to ≤ `bins` rows; the global min/max is a 1-row
    * broadcast. Empty bins are densified from the bins-sized spine so
    * the output is always exactly `bins` rows (a histogram with holes
    * reads as data, not absence). When bins exceeds the value range
    * (hi − lo + 1), the surplus bins have an empty integer span — they
    * emit (null, null, 0), never inverted hi < lo bounds; an empty
    * input yields `bins` such rows. */
  def equiWidthHistogram(df: DataFrame, valueCol: String,
                         bins: Int = 20): DataFrame = {
    require(bins > 0, "bins must be positive")
    val bounds = df.agg(min(col(valueCol)).as("_lo"),
      max(col(valueCol)).as("_hi"))
    val counts = df.crossJoin(broadcast(bounds))
      .select(least(lit(bins - 1).cast("long"),
        expr(s"(($valueCol - _lo) * $bins) div (_hi - _lo + 1)")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    // the EXACT inverse of the assignment formula: bin b holds offsets
    // o with b = o·bins div range, i.e. o ∈ [⌈b·range/bins⌉,
    // ⌈(b+1)·range/bins⌉ − 1] — ceil, NOT floor (a floor spine drifts
    // off the assignment partition whenever bins ∤ range, claiming
    // bounds that exclude values actually counted in the bin)
    val rawLo = col("_lo") +
      expr(s"(bin * (_hi - _lo + 1) + ${bins - 1}) div $bins")
    val rawHi = col("_lo") +
      expr(s"((bin + 1) * (_hi - _lo + 1) + ${bins - 1}) div $bins") - 1
    val spine = bounds.select(
        explode(sequence(lit(0L), lit(bins - 1L))).as("bin"),
        col("_lo"), col("_hi"))
      .select(col("bin"),
        // a bin whose integer span is empty (bins > range) gets null
        // bounds, not inverted ones; null _lo/_hi (empty input) stays
        // null through the comparison
        when(rawHi >= rawLo, rawLo).as("lo"),
        when(rawHi >= rawLo, rawHi).as("hi"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), col("lo"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bin"))
  }

  /** Within-group percentile normalization: map every distinct
    * (group, value) to its inclusive cumulative share of the group in
    * micro units (cume_dist, exact integers) — the feature-scaling
    * step that makes scores comparable ACROSS groups before mixing
    * (a "good" doc length in code is not a good length in prose;
    * percentile-normalize per language and one threshold works
    * everywhere). Join the output back on (group, value) to tag raw
    * rows.
    *
    * Output per distinct (group, value): (group, value, n,
    * pct_micro = inclusive-rank share · 10⁶, integer floor division).
    *
    * Scale: the [[cumAndTot]] discipline — corpus contracts to
    * (group, value) map-side, the cumsum is adaptive-salted, nothing
    * downstream sees raw rows. */
  def percentileNormalize(df: DataFrame, groupCol: String,
                          valueCol: String, salt: Int = 16,
                          saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    val contracted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_w"))
    cumAndTot(contracted, groupCol, valueCol, salt, saltMinRows,
        materialize = salt > 1)
      .select(col(groupCol), col(valueCol), col("_w").as("n"),
        expr("_cum * 1000000 div _tot").as("pct_micro"))
      .orderBy(col(groupCol), col(valueCol))
  }

  /** Per-group winsorization stats: clamp an INTEGER value column at
    * the group's discrete pLo/pHi percentiles and report how much was
    * clamped — the robust-scaling step quality-score filters need
    * before thresholding (a handful of 10 MB outlier docs otherwise
    * drag a mean-based cutoff). Percentiles are the DISCRETE
    * (type-1 / lower) quantile — the smallest v with
    * 100·F(v) ≥ p·total — so every comparison is exact integer
    * arithmetic and the result is bit-identical cross-engine (the
    * interpolated quantile_cont would reintroduce float ulp).
    *
    * Scale shape: same contraction discipline as [[weightedMedian]] —
    * the cumsum runs over the (group, distinct value) contraction,
    * never the raw table, and `salt`/`saltMinRows` (via
    * [[cumAndTot]]'s adaptive pick) keep even a corpus-sized
    * contraction (near-unique values) from funneling through
    * per-group single-task windows; the per-group
    * threshold table (one row per group) broadcasts back onto the raw
    * stream, which is clamped map-side and re-aggregated with map-side
    * partials. Two corpus passes, both shuffle-bounded by the key
    * domain. */
  def winsorizeStats(df: DataFrame, groupCol: String, valueCol: String,
                     pLo: Int = 5, pHi: Int = 95,
                     salt: Int = 16,
                     saltMinRows: Long = AdaptiveSaltRows): DataFrame = {
    val contracted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_w"))
    val bounds = cumAndTot(contracted, groupCol, valueCol, salt, saltMinRows,
        materialize = salt > 1)
      .groupBy(col(groupCol))
      .agg(
        min(when(col("_cum") * 100 >= lit(pLo) * col("_tot"),
          col(valueCol))).as("lo"),
        min(when(col("_cum") * 100 >= lit(pHi) * col("_tot"),
          col(valueCol))).as("hi"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum((col(valueCol) < col("lo")).cast("long")).as("n_clamped_lo"),
        sum((col(valueCol) > col("hi")).cast("long")).as("n_clamped_hi"),
        sum(least(greatest(col(valueCol), col("lo")), col("hi"))
          .cast("long")).as("winsorized_sum"))
  }

  /** Lag-k autocorrelation of a daily metric series, k = 1..maxLag —
    * the weekly-cycle / momentum detector ([[graft.ops.Behavior.dowSeasonality]]
    * shows WHICH day is high; this shows whether the series remembers
    * itself, e.g. acf(7) ≫ acf(1) = a strong weekly cycle). Each lag's
    * coefficient is the Pearson correlation of the series with itself
    * shifted k days, computed over the overlapping day pairs (the
    * standard sample-ACF-with-per-lag-renormalization variant — robust
    * to missing days because pairing is by CALENDAR day, not row
    * offset: a gap day simply produces no pair at any lag it touches).
    *
    * Determinism: per-day values are exact micro-integer sums; every
    * per-lag moment (Σx, Σy, Σxy, Σx², Σy²) accumulates as
    * decimal(38,0) — cross-products of micro values overflow int64 at
    * ~10⁴-dollar days — and the correlation is a handful of IEEE
    * double ops per lag on exact integers (the corrMatrix recipe).
    *
    * Scale: ONE day-keyed hash aggregate contracts the corpus to its
    * calendar span; the lag expansion (explode ×maxLag) and
    * day+k self-join run on that contraction (≤ 365·maxLag rows/year)
    * — nothing after the first aggregate sees row counts. Output one
    * row per lag: (lag, n_pairs, acf_micro). */
  /** STL-lite daily decomposition: centered 7-day moving-average trend
    * and the residual against it — the trend-aware anomaly view that
    * complements [[graft.ops.Behavior.rateAnomaly]] (trailing z-score,
    * reacts to level shifts) and [[graft.ops.Behavior.dowSeasonality]]
    * (which day is high): a slow ramp is TREND here, not seven
    * consecutive anomalies. The window is CALENDAR-framed (RANGE over
    * epoch day, ±3), so a missing day shrinks the neighborhood instead
    * of silently pulling in a week-old value, and the trend is only
    * emitted where the full 7-day neighborhood exists (edges and
    * gap-adjacent days report null trend/residual rather than a
    * partial-window estimate that would read as an anomaly).
    *
    * Determinism: daily sums are exact micro integers, and the trend
    * is reported as the raw 7-day SUM with the residual ×7 (resid_x7 =
    * 7·v − sum7) — all exact integer arithmetic, NO division at all:
    * Spark's `div` truncates while DuckDB's `//` floors (they diverge
    * on negative sums — the q151 lesson), and a double mean loses
    * exactness past 2⁵³. Divide by 7 (or 7·10⁶) at the consumer.
    *
    * Scale: one day-keyed hash aggregate contracts the corpus to its
    * calendar span; the RANGE window runs unpartitioned OVER THE
    * CONTRACTION (gate-legal — bounded by the calendar, never rows).
    * Output per day: (day, v_micro, sum7_micro, resid_x7_micro). */
  def trendResidual(events: DataFrame, tsCol: String = "ts",
                    valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400)
      .cast("long").as("day")
    val daily = events
      .select(day, round(col(valueCol) * 1e6).cast("long").as("vm"))
      .groupBy(col("day")).agg(sum(col("vm")).as("v_micro"))
    val w = Window.orderBy(col("day")).rangeBetween(-3, 3)
    daily
      .withColumn("_n7", count(lit(1)).over(w))
      .withColumn("sum7_micro",
        when(col("_n7") === 7, sum(col("v_micro")).over(w)))
      .select(col("day"), col("v_micro"), col("sum7_micro"),
        (col("v_micro") * 7 - col("sum7_micro")).as("resid_x7_micro"))
      .orderBy(col("day"))
  }

  def dailyAcf(events: DataFrame, tsCol: String = "ts",
               valueCol: String = "value", maxLag: Int = 7): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400)
      .cast("long").as("day")
    val daily = events
      .select(day, round(col(valueCol) * 1e6).cast("long").as("vm"))
      .groupBy(col("day")).agg(sum(col("vm")).as("v"))
    val lagged = daily
      .select(col("day"), col("v"),
        explode(array((1 to maxLag).map(lit): _*)).as("lag"))
      .select((col("day") + col("lag")).as("day"), col("lag"),
        col("v").as("x"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    lagged.join(daily.withColumnRenamed("v", "y"), Seq("day"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .select(col("lag"), col("n_pairs"), {
        val n = col("n_pairs").cast("double")
        val d = (c: Column) => c.cast("double")
        val cov = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
        val vx = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
        val vy = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
        when(vx > 0 && vy > 0,
          round(cov / sqrt(vx * vy) * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("acf_micro")
      })
      .orderBy(col("lag"))
  }

  /** Two-sided CUSUM changepoint screen over a daily value series
    * (Page 1954): S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − μ − κ)) accumulates
    * sustained upward drift, S⁻ₜ the mirrored downward form, and a day
    * flags when its statistic crosses h = `hMult`·κ — the
    * mean-shift detector a level-based z-score (q115) misses, because
    * small persistent shifts never clear a per-day threshold but sum
    * without bound in S.
    *
    * The recursion is NOT a window sum, but it has a closed prefix
    * form: with Cₜ = Σ_{j≤t} (xⱼ − μ − κ) and C₀ = 0,
    * S⁺ₜ = Cₜ − min(0, min_{j≤t} Cⱼ) — two cumulative windows, no
    * sequential fold. Everything is exact BIGINT micros (the q166
    * contraction: per-day sums of round(value·1e6)); μ is the global
    * daily mean via positive-domain floor division (truncation ≡
    * floor there, the engine-parity rule) and κ = μ/`kDen` the
    * allowance, so both engines replay the trajectory exactly.
    *
    * Scale: one corpus pass builds the daily contraction; μ/κ ride a
    * 1-row broadcast; the two cumulative windows run over the
    * calendar-bounded daily frame (years × 365 rows — the gapFillDays
    * argument), so the single-task window is bounded by the calendar,
    * never the corpus. */
  def cusumChangepoints(events: DataFrame, tsCol: String = "ts",
                        valueCol: String = "value",
                        kDen: Int = 20, hMult: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kDen > 0 && hMult > 0, "kDen and hMult must be positive")
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400)
      .cast("long").as("day")
    val daily = events
      .select(day, round(col(valueCol) * 1e6).cast("long").as("vm"))
      .groupBy(col("day")).agg(sum(col("vm")).as("v"))
    val par = daily.agg(expr("sum(v) div count(1)").as("mu"))
      .select(col("mu"), expr(s"mu div $kDen").as("kappa"))
    val cum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = daily.crossJoin(broadcast(par))
      .select(col("day"), col("v"), col("kappa"),
        sum(col("v") - col("mu") - col("kappa")).over(cum).as("cp"),
        sum(col("mu") - col("kappa") - col("v")).over(cum).as("cn"))
    c.select(col("day"), col("v").as("v_micro"),
        (col("cp") - least(lit(0L), min(col("cp")).over(cum))).as("s_pos"),
        (col("cn") - least(lit(0L), min(col("cn")).over(cum))).as("s_neg"),
        col("kappa"))
      .select(col("day"), col("v_micro"), col("s_pos"), col("s_neg"),
        when(col("s_pos") > col("kappa") * hMult, 1L).otherwise(0L)
          .as("flag_up"),
        when(col("s_neg") > col("kappa") * hMult, 1L).otherwise(0L)
          .as("flag_down"))
      .orderBy(col("day"))
  }

  /** Per-(group, day) time-weighted average of an irregular event
    * series (TWAP): each observation holds until the next one in its
    * (group, day) partition, the last until day end; the interval
    * before a day's first observation carries no value. The metric an
    * arithmetic mean gets wrong whenever sampling is bursty —
    * a price sampled 100× during a spike must not count 100×.
    *
    * Determinism: weights are integer seconds from epoch arithmetic,
    * values integer micros, the numerator an exact decimal(38,0) sum,
    * and the final division is integral `div` on a positive domain
    * (floor ≡ truncate there, ≡ DuckDB `//`). Observation order within
    * a tie is pinned by the id column (tied observations get zero
    * duration except the last — deterministic in every engine).
    *
    * Scale: one pass; the only exchange is the (group, day) window +
    * aggregate — the same key partitioning for both, so Catalyst runs
    * them on one shuffle. Per-(group, day) task size is the day's
    * observation count for that group; a corpus-scale hot group rides
    * the [[graft.ops.SkewJoin]] salting the median family uses. */
  def timeWeightedAvg(events: DataFrame, groupCol: String = "event_type",
                      tsCol: String = "ts", valueCol: String = "value",
                      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(
      col(groupCol).as("grp"),
      floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long").as("day"),
      floor(unix_timestamp(col(tsCol))).cast("long").as("ep"),
      col(idCol).as("id"),
      round(col(valueCol) * 1e6).cast("long").as("vm"))
    val w = Window.partitionBy(col("grp"), col("day"))
      .orderBy(col("ep"), col("id"))
    val dur = base
      .withColumn("dur",
        coalesce(lead(col("ep"), 1).over(w), (col("day") + 1) * 86400L)
          - col("ep"))
    dur.groupBy(col("grp").as(groupCol), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dur")).as("active_seconds"),
        sum(col("vm").cast("decimal(38,0)")
          * col("dur").cast("decimal(38,0)")).as("_num"))
      .select(col(groupCol), col("day"), col("n_events"),
        col("active_seconds"),
        expr("_num div active_seconds").as("twa_micro"))
      .orderBy(col(groupCol), col("day"))
  }
}
