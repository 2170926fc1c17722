package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over event streams: ordered-step
  * funnels and cohort retention. The reference's event pipeline stops at
  * sessionization and windowed revenue (services/streaming/
  * streaming_sales_aggregator.py); these are the next two queries every
  * event warehouse runs on the same table, expressed so each stage is
  * one key-partitioned aggregate or join — no per-user state collection,
  * no driver loops.
  *
  * Scale notes (100 TB events):
  *  - every stage keys on the user column, so consecutive stages reuse
  *    the same hash partitioning (Exchange reuse / AQE coalesces);
  *  - step filters are pushed to the scan (event_type predicate), so a
  *    3-step funnel reads 3/5ths of nothing it doesn't need;
  *  - per-user state is O(steps) columns, never a collected event list —
  *    a power user with 10^6 events costs the same row width as one
  *    with 3.
  */
object Behavior {

  /** Ordered-step funnel with a per-step completion horizon.
    *
    * A user completes step i+1 at the EARLIEST event of that step type
    * that is strictly after their step-i completion and within
    * `horizonSec` of it (the standard "earliest qualifying transition"
    * semantics — greedy per step, deterministic, and computable with one
    * min-aggregate per step instead of a per-user event scan).
    *
    * Returns one row per funnel step: (step, step_name, n_users,
    * pct_of_first) with n_users = users whose journey reached AT LEAST
    * that step, pct rounded to 2 dp (100.0 for the first step; null —
    * guarded, not 0/0 NaN — when step 1 has no users).
    *
    * Physical shape: one filtered min-aggregate per step, chained by
    * inner joins on the user key (all shuffles share the user hash
    * partitioning), then a 3-row roll-up. Nothing is ever collected per
    * user; timestamps are compared on floored epoch seconds so batch
    * and oracle agree exactly.
    */
  def funnel(events: DataFrame, steps: Seq[String], horizonSec: Long,
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val ep = floor(unix_timestamp(col(tsCol))).cast("long")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      ep.as("ep"))

    // reached(i): (u, t_i) = earliest qualifying completion of step i.
    // Each frame is user-cardinality and consumed TWICE (next step's
    // qualifier + the deepest-step join), so it's checkpointed: without
    // it the unshared chain re-derives step i from raw events once per
    // later consumer (6 scans for 3 steps, observed — exchange reuse
    // does not fire across the differently-filtered subtrees), which at
    // 100 TB means re-reading the fact table O(steps²/2) times.
    import org.apache.spark.storage.StorageLevel
    def ckpt(df: DataFrame): DataFrame =
      df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    var reached = ckpt(base.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ep")).as("ts")))
    var perUser = reached.select(col("u"), col("ts").as("ts1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val nxt = ckpt(base.filter(col("t") === step)
        .join(reached.select(col("u"), col("ts").as("prev")), Seq("u"))
        .filter(col("ep") > col("prev") &&
          col("ep") <= col("prev") + lit(horizonSec))
        .groupBy(col("u")).agg(min(col("ep")).as("ts")))
      reached = nxt
      perUser = perUser.join(
        nxt.select(col("u"), col("ts").as(s"ts${i + 1}")), Seq("u"), "left")
    }

    // deepest step reached per user → per-step counts → cumulative
    // "reached at least" via a reverse running sum over `steps.size` rows
    val deepest = perUser.select(col("u"),
      steps.indices.drop(1).foldLeft(lit(1)) { (acc, i) =>
        when(col(s"ts${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
      }.as("deepest"))
    val counts = deepest.groupBy(col("deepest").as("step"))
      .agg(count(lit(1)).as("n_exact"))
    val session = events.sparkSession
    import session.implicits._
    val names = steps.zipWithIndex
      .map { case (n, i) => (i + 1, n) }
      .toDF("step", "step_name")
    val w = Window.orderBy(col("step").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val firstW = Window.orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, 0)
    broadcast(names).join(counts, Seq("step"), "left")
      .withColumn("n_users",
        sum(coalesce(col("n_exact"), lit(0L))).over(w))
      .withColumn("pct_of_first",
        when(first(col("n_users")).over(firstW) === 0,
          lit(null).cast("double"))
          .otherwise(round(col("n_users") * lit(100.0) /
            first(col("n_users")).over(firstW), 2)))
      .select(col("step").cast("long").as("step"), col("step_name"),
        col("n_users"), col("pct_of_first"))
      .orderBy(col("step"))
  }

  /** Cohort retention: users bucketed by the epoch day of their FIRST
    * event ("cohort"), then counted as retained in week `w` if they
    * have any event in day range [cohort + 7w, cohort + 7(w+1)).
    *
    * Returns (cohort_day, week_offset, n_users, pct_of_cohort): one row
    * per cohort × observed week offset (weeks with zero retained users
    * simply don't appear — at corpus scale a dense grid is the join of
    * this with a calendar frame, not a wider shuffle here). Week 0 is
    * the cohort size by construction (every user is active on their
    * first day), which makes pct_of_cohort self-normalizing without a
    * second pass: a window max over the cohort partition recovers the
    * week-0 count.
    *
    * Physical shape: distinct (user, day) first — collapsing each
    * user-day to one row BEFORE the first-day aggregate and the
    * self-join keeps every later exchange proportional to active
    * user-days, not raw events (at 100 TB that's the difference between
    * shuffling page views and shuffling DAU) — then a user-keyed join
    * and one (cohort, week) aggregate.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long")
    val userDays = events.select(col(userCol).as("u"), day.as("dd")).distinct()
    val firstDay = userDays.groupBy(col("u")).agg(min(col("dd")).as("cohort"))
    val weekly = userDays.join(firstDay, Seq("u"))
      .withColumn("week_offset",
        floor((col("dd") - col("cohort")) / 7).cast("long"))
      .groupBy(col("cohort").as("cohort_day"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
    val cohortSize = Window.partitionBy(col("cohort_day"))
    weekly
      .withColumn("pct_of_cohort",
        round(col("n_users") * lit(100.0) /
          max(when(col("week_offset") === 0, col("n_users"))).over(cohortSize),
          2))
      .orderBy(col("cohort_day"), col("week_offset"))
  }

  /** Cohort value curves — the monetization companion of [[retention]]
    * (the LTV view every subscription/commerce warehouse reports): per
    * (first-seen-day cohort, week offset), active users, revenue, the
    * cohort's CUMULATIVE revenue, and cumulative revenue per cohort
    * member in micro-units (the LTV curve a payback model reads off).
    *
    * Integer-exact: revenue is cents-quantized before any aggregation;
    * the LTV division is integer micro-arithmetic
    * (cents·10⁴ div cohort_users), so rows hash identically
    * cross-engine. Cohort size rides the week-0 row via the q72 window
    * trick (every member is active in their own first week), avoiding
    * a second per-user aggregate.
    *
    * Scale: one distinct-(user, day, value-sum) style contraction →
    * per-user min (map-side combinable) → one join back on user →
    * (cohort, week) contraction; the cumulative window partitions by
    * cohort day over week offsets — frames bounded by calendar
    * cardinality, never user or event counts. */
  def cohortValue(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts",
                  valueCol: String = "value"): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long")
    val base = events.select(col(userCol).as("u"), day.as("dd"),
      expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("cents"))
    val firstDay = base.groupBy(col("u")).agg(min(col("dd")).as("cohort"))
    val weekly = base.join(firstDay, Seq("u"))
      .withColumn("week_offset",
        floor((col("dd") - col("cohort")) / 7).cast("long"))
      .groupBy(col("cohort").as("cohort_day"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"),
        sum(col("cents")).as("revenue_cents"))
    val byCohort = Window.partitionBy(col("cohort_day"))
    val cum = byCohort.orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_revenue_cents",
        sum(col("revenue_cents")).over(cum))
      .withColumn("cohort_users",
        max(when(col("week_offset") === 0, col("n_users"))).over(byCohort))
      .select(col("cohort_day"), col("week_offset"), col("n_users"),
        col("revenue_cents"), col("cum_revenue_cents"),
        expr("cum_revenue_cents * 10000 div cohort_users").as("ltv_micro"))
      .orderBy(col("cohort_day"), col("week_offset"))
  }

  /** Event-rate anomaly detection: per (event_type, time bucket) counts
    * scored against a trailing-window baseline — z = (n − mean) / std
    * over the previous `trailing` buckets (current bucket excluded, so
    * the spike being tested never contaminates its own baseline). Only
    * buckets with a FULL trailing window and non-zero baseline variance
    * are scored; |z| ≥ `minZ` rows are returned.
    *
    * Determinism: bucket counts are integers; the baseline mean/std is
    * double math on one row's frame of ≤`trailing` integers (identical
    * sequence on any engine), and z is micro-quantized for the oracle
    * hash. Population std — the frame IS the baseline, not a sample.
    *
    * Scale: the raw-event aggregate collapses 100 TB to
    * (types × buckets) rows before the window; the window partitions by
    * event_type and slides over a bounded ROWS frame, so no partition
    * outgrows types × buckets-per-partition regardless of event volume.
    */
  def rateAnomaly(events: DataFrame, bucketSec: Long = 900,
                  trailing: Int = 8, minZ: Double = 2.0,
                  typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    val bucket = (floor(floor(unix_timestamp(col(tsCol))) / bucketSec) *
      bucketSec).cast("long")
    val counts = events
      .groupBy(col(typeCol).as("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    counts
      .withColumn("base_n", count(col("n")).over(frame))
      .withColumn("base_sum", sum(col("n")).over(frame))
      .withColumn("base_sumsq", sum(col("n") * col("n")).over(frame))
      .filter(col("base_n") === trailing)
      .withColumn("mean", col("base_sum").cast("double") / trailing)
      .withColumn("std",
        sqrt(col("base_sumsq").cast("double") / trailing -
          col("mean") * col("mean")))
      .filter(col("std") > 0)
      .withColumn("z_micro",
        round((col("n") - col("mean")) / col("std") * 1e6).cast("long"))
      .filter(abs(col("z_micro")) >= (minZ * 1e6).toLong)
      .select(col("event_type"), col("bucket"), col("n"),
        round(col("mean"), 2).as("baseline_mean"), col("z_micro"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Rolling active users: for each observed day, DAU (distinct users
    * that day), MAU_28 (distinct users over the trailing 28 days), and
    * the DAU/MAU stickiness ratio — the engagement triple every event
    * warehouse reports daily.
    *
    * Physical shape — the "contribution expansion": each distinct
    * (user, day) row contributes to the 28 target days it keeps the
    * user active for, via an explode(sequence(...)) bounded at ×28,
    * then ONE distinct + count per target day. This trades a 28×
    * row expansion of the user-DAY contraction (already tiny next to
    * raw events) for completely even key distribution — against the
    * alternative (a day-range self-join), there is no skew cliff and
    * no O(days²) window. Target days outside the observed range drop
    * via an equi-join with the day frame.
    *
    * The HLL path for 100 TB: [[rollingActiveUsersSketch]] unions 28
    * DAILY sketches per target day (days × 28 sketch rows total,
    * independent of user count); this exact form is its oracle at test
    * scale. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 28,
                         userCol: String = "user_id",
                         tsCol: String = "ts"): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long")
    val ud = events.select(col(userCol).as("u"), day.as("d")).distinct()
    val days = ud.select(col("d").as("target")).distinct()
    val contrib = ud
      .select(col("u"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("target"))
      .join(days, Seq("target"))
      .distinct()
    val mau = contrib.groupBy(col("target"))
      .agg(count(lit(1)).as("mau")) // contrib is already (u, target)-distinct
    val dau = ud.groupBy(col("d").as("target"))
      .agg(count(lit(1)).as("dau")) // ud is already (u, d)-distinct
    dau.join(mau, Seq("target"))
      .select(col("target").as("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  /** The sketch form of [[rollingActiveUsers]]: one HLL sketch per
    * (day), each unioned into the `windowDays` target days it covers —
    * the union input is days × window SKETCH rows regardless of user
    * count, which at 100 TB is the difference between shuffling DAU
    * rows ×28 and shuffling a few thousand constant-size buffers. No
    * DuckDB oracle (sketch layouts are engine-specific); BehaviorSpec
    * pins the estimates to the exact form within tolerance. */
  def rollingActiveUsersSketch(events: DataFrame, windowDays: Int = 28,
                               userCol: String = "user_id",
                               tsCol: String = "ts",
                               lgK: Int = 14): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long")
    val daily = events.select(col(userCol).as("u"), day.as("d"))
      .groupBy(col("d"))
      .agg(hll_sketch_agg(col("u"), lit(lgK)).as("sk"))
    val days = daily.select(col("d").as("target")).distinct()
    daily
      .select(col("sk"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("target"))
      .join(days, Seq("target"))
      .groupBy(col("target"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("mau_est"))
      .select(col("target").as("day"), col("mau_est"))
      .orderBy(col("day"))
  }

  /** Top-k session path trigrams — "behavior flows": the most common
    * ordered 3-step event sequences within a session (30-min
    * inactivity gap, the q32 convention). The product-analytics view
    * of what users actually DO, one level above single-event counts.
    *
    * Physical shape: one user-keyed exchange feeds all three window
    * passes (lag, running session sum, leads) — hashpartitioning(user)
    * already satisfies the (user, sess) clustering requirement, so the
    * session-scoped window inserts only a LOCAL re-sort, never a second
    * shuffle (verified in the plan: one Exchange before the windows,
    * one after for the trigram count). Ties inside a second break on an
    * id column for determinism. */
  def pathTrigrams(events: DataFrame, gapSec: Long = 1800, k: Int = 20,
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val epoch = floor(unix_timestamp(col(tsCol))).cast("long")
    val gap = epoch - lag(epoch, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSec, 1).otherwise(0)
    val sessioned = events
      .withColumn("sess",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val sw = Window.partitionBy(col(userCol), col("sess"))
      .orderBy(col(tsCol), col(idCol))
    sessioned
      .withColumn("t2", lead(col(typeCol), 1).over(sw))
      .withColumn("t3", lead(col(typeCol), 2).over(sw))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col(typeCol).as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Per-day session bounce rate: the share of sessions containing
    * exactly one event (30-min inactivity-gap sessionization, the q32
    * convention; a session belongs to its START day) — the
    * engagement-quality headline next to DAU/MAU.
    *
    * Physical shape — the q127 plan fact: ONE user-keyed exchange
    * feeds both window passes (lag for the gap flag, running sum for
    * the session id); the per-session roll-up re-aggregates on
    * (user, sess) already clustered by the same exchange, and the
    * day roll-up contracts session-cardinality rows. Ties inside a
    * second break on the id column for determinism. */
  def bounceRate(events: DataFrame, gapSec: Long = 1800,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val epoch = floor(unix_timestamp(col(tsCol))).cast("long")
    val gap = epoch - lag(epoch, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSec, 1).otherwise(0)
    val sessioned = events.withColumn("sess",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned.groupBy(col(userCol), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        min(expr(s"CAST(floor(unix_timestamp($tsCol)) AS BIGINT) div 86400"))
          .as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        round(col("n_bounces").cast("double") * 100 / col("n_sessions"), 4)
          .as("bounce_pct"))
      .orderBy(col("day"))
  }

  /** Per-group binomial rate with Wilson 95% score interval — the
    * "is this CTR difference real" screen (never report a rate off a
    * small denominator without its interval). For each group:
    * successes s, trials n, rate, and the Wilson bounds
    * (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n), z = 1.96.
    *
    * Deterministic: one integer count aggregate per group, then a
    * fixed sequence of double ops on two scalars — identical on any
    * engine; bounds micro-quantized. Scale: one map-side-combined
    * aggregate; the interval math runs on the group contraction. */
  def wilsonRate(events: DataFrame, successType: String,
                 trialTypes: Seq[String],
                 groupCol: String = "user_id",
                 typeCol: String = "event_type"): DataFrame = {
    val z = 1.96
    val grouped = events
      .filter(col(typeCol).isin(trialTypes: _*))
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(typeCol) === successType, 1L).otherwise(0L)).as("s"))
    val n = col("n").cast("double")
    val p = col("s").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))
    grouped.select(col("grp"), col("n"), col("s"),
        round(p * 1e6).cast("long").as("rate_micro"),
        round((center - margin) / denom * 1e6).cast("long").as("lo_micro"),
        round((center + margin) / denom * 1e6).cast("long").as("hi_micro"))
      .orderBy(col("grp"))
  }

  /** Time-to-convert distribution: for each user's FIRST entry-step
    * event, the lag to their first qualifying conversion after it
    * (the q71 funnel's earliest-transition semantics, horizon-free),
    * summarized as lag percentiles — the "how long does the funnel
    * take" half of conversion analysis.
    *
    * Percentiles via approx_percentile at accuracy 10⁶ (exact data
    * elements at oracle scale ≙ DuckDB quantile_disc, constant-memory
    * sketch at volume — the q69/q129 convention). Scale: two filtered
    * min-aggregates on the user key + one global sketch aggregate. */
  def timeToConvert(events: DataFrame, entryType: String,
                    conversionType: String,
                    userCol: String = "user_id", typeCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    val ep = floor(unix_timestamp(col(tsCol))).cast("long")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      ep.as("ep"))
    val entry = base.filter(col("t") === entryType)
      .groupBy(col("u")).agg(min(col("ep")).as("t0"))
    val lags = base.filter(col("t") === conversionType)
      .join(entry, Seq("u"))
      .filter(col("ep") > col("t0"))
      .groupBy(col("u")).agg(min(col("ep") - col("t0")).as("lag"))
    lags.agg(
      count(lit(1)).as("n_converted"),
      expr("approx_percentile(lag, array(0.5, 0.9, 0.99), 1000000)").as("pq"),
      min(col("lag")).as("min_lag"), max(col("lag")).as("max_lag"))
      .select(col("n_converted"),
        element_at(col("pq"), 1).as("p50_lag"),
        element_at(col("pq"), 2).as("p90_lag"),
        element_at(col("pq"), 3).as("p99_lag"),
        col("min_lag"), col("max_lag"))
  }

  /** EWMA forecast baseline over per-bucket event counts — the
    * smoothing half of rate monitoring ([[rateAnomaly]] flags against
    * a flat mean; this produces the exponentially-weighted forecast
    * and residual that trend-following dashboards and alert
    * thresholds consume).
    *
    * Truncated-window form, NOT the recursion: forecast_t =
    * Σ_{i=1..K} α(1−α)^{i−1}·x_{t−i} / Σ_{i=1..K} α(1−α)^{i−1} —
    * the bucket's own count is excluded (a forecast, not a smooth),
    * and the weight tail past K is renormalized away. With α=0.3,
    * K=16 the dropped tail is (1−α)^16 ≈ 0.3%. The recursion would
    * need either a sequential scan per key (no partition parallelism
    * inside a series) or an unbounded-preceding window carrying
    * pow() over the full history (numerically explosive); the
    * truncated form is one bounded ROWS frame, deterministic, and
    * exact integer inputs → identical doubles on any engine.
    *
    * Only buckets with all K lags observed are emitted (the
    * [[rateAnomaly]] full-window gate). Scale: the window runs on the
    * (type × bucket) contraction. */
  def ewmaForecast(events: DataFrame, bucketSec: Long = 900,
                   alpha: Double = 0.3, k: Int = 16,
                   typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    val bucket = (floor(floor(unix_timestamp(col(tsCol))) / bucketSec) *
      bucketSec).cast("long")
    val counts = events
      .groupBy(col(typeCol).as("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val weights = (1 to k).map(i => alpha * math.pow(1 - alpha, i - 1))
    val norm = weights.sum
    val weighted = (1 to k).map(i =>
      lag(col("n"), i).over(w) * lit(weights(i - 1)))
      .reduce(_ + _)
    counts
      .withColumn("n_lags",
        (1 to k).map(i =>
          when(lag(col("n"), i).over(w).isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .withColumn("forecast", weighted / lit(norm))
      .filter(col("n_lags") === k)
      .select(col("event_type"), col("bucket"), col("n"),
        round(col("forecast") * 1e6).cast("long").as("forecast_micro"),
        round((col("n") - col("forecast")) * 1e6).cast("long")
          .as("residual_micro"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * user's most recent touch event (any of `touchTypes`) within
    * `horizonSec` before it; conversions with no qualifying touch are
    * credited to "organic". Returns one row per credited channel:
    * (channel, n_conversions, avg_lag_sec).
    *
    * Physical shape: ONE window pass — events sort once per user by
    * (time, tie-break) and the last preceding touch arrives via
    * last(..., ignoreNulls) over an unbounded-preceding frame. No
    * self-join, no range join: the fact table shuffles exactly once on
    * the user key. The horizon is applied AFTER the window (a lag
    * filter), so the frame never needs a RANGE bound — ROWS frames
    * stream in O(1) memory per row while the equivalent range join
    * would rescan each user's touch history per conversion.
    *
    * Determinism: epoch-second comparisons; ties inside one second
    * break on event type then a stable id column if present. Lag
    * averages are exact integer sums divided once at the end. */
  def lastTouchAttribution(events: DataFrame,
                           conversionType: String = "purchase",
                           touchTypes: Seq[String] = Seq("click", "view"),
                           horizonSec: Long = 3600,
                           userCol: String = "user_id",
                           typeCol: String = "event_type",
                           tsCol: String = "ts",
                           idCol: String = "event_id"): DataFrame = {
    val ep = floor(unix_timestamp(col(tsCol))).cast("long")
    val base = events
      .filter(col(typeCol).isin(conversionType +: touchTypes: _*))
      .select(col(userCol).as("u"), col(typeCol).as("t"), ep.as("ep"),
        col(idCol).as("eid"))
    // touches sort before a same-second conversion so an instantaneous
    // touch→conversion still attributes; among same-second touches the
    // highest event id wins (latest arrival, stable tie-break)
    val isConv = col("t") === conversionType
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ep"), isConv.cast("int"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = base
      .withColumn("touch",
        last(when(!isConv, struct(col("ep").as("tep"), col("t").as("tt"))),
          ignoreNulls = true).over(w))
      .filter(isConv)
      .withColumn("lag_sec", col("ep") - col("touch.tep"))
      .withColumn("channel",
        when(col("touch").isNotNull && col("lag_sec") <= horizonSec,
          col("touch.tt")).otherwise(lit("organic")))
    attributed
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(avg(when(col("channel") =!= "organic", col("lag_sec"))), 2)
          .as("avg_lag_sec"))
      .orderBy(col("channel"))
  }

  /** Per-user behavioral entropy, rolled up to a histogram — the
    * diversity screen for engagement quality and bot triage: a user
    * whose events are one type has entropy 0 (scripted scrapers, ping
    * loops); organic users spread across types. H = ln N − (Σ n·ln n)/N
    * in nats over the user's event-type distribution, reported as a
    * bucket histogram (bucket = H_micro div `bucketMicros`, default
    * 0.01 nat) with per-bucket user counts and the entropy range.
    *
    * Determinism: per-type counts are exact integers; each n·ln n term
    * is nano-quantized BEFORE the per-user sum (the q121 convention),
    * and the one ln/divide per user runs on exact integers — identical
    * IEEE ops cross-engine.
    *
    * Scale: one (user, type) hash aggregate contracts the corpus
    * map-side; the per-user fold aggregates ≤ |event types| rows per
    * user; the histogram contracts users to ≤ a few dozen buckets. No
    * windows, no skew surface (a power user still has ≤ |types| rows
    * after the first aggregate). */
  def entropyHistogram(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type",
                       bucketMicros: Long = 10000L): DataFrame = {
    val perType = events.groupBy(col(userCol).as("u"),
        col(typeCol).as("t"))
      .agg(count(lit(1)).as("n"))
    val perUser = perType
      .select(col("u"), col("n"),
        round(col("n").cast("double") * log(col("n").cast("double")) * 1e9)
          .cast("long").as("term_nano"))
      .groupBy(col("u"))
      .agg(sum(col("n")).as("nn"), sum(col("term_nano")).as("s_nano"))
      .select(col("u"),
        // clamped at 0: H is mathematically ≥ 0, but the nano-term
        // rounding can land a single-type user at −1 micro, and Spark's
        // `div` truncates toward zero while DuckDB's `//` floors — a
        // negative micro value would bucket differently cross-engine
        greatest(lit(0L),
          round((log(col("nn").cast("double")) -
            col("s_nano").cast("double") / 1e9 / col("nn")) * 1e6)
            .cast("long")).as("h_micro"))
    perUser
      .groupBy(expr(s"h_micro div $bucketMicros").as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        min(col("h_micro")).as("min_h_micro"),
        max(col("h_micro")).as("max_h_micro"))
      .orderBy(col("bucket"))
  }

  /** Day-of-week seasonality profile: per weekday, event count,
    * cents-exact value mass, its share of the total, and the
    * seasonality INDEX (share × 7 — 1e6 means "an average day", 2e6
    * "twice an average day") that forecasting and anomaly baselines
    * divide out before comparing days. Weekday 0 = Thursday epoch
    * convention avoided: dow = (epoch_day + 4) mod 7 maps 0→Sunday …
    * 6→Saturday, stated here so consumers don't guess.
    *
    * Determinism: integer day/cents arithmetic end-to-end; share and
    * index are integer floor divisions into micro units.
    *
    * Scale: one hash aggregate to ≤ 7 rows; the total rides a window
    * over that 7-row contraction (gate-legal). */
  def dowSeasonality(events: DataFrame, tsCol: String = "ts",
                     valueCol: String = "value"): DataFrame = {
    val day = floor(floor(unix_timestamp(col(tsCol))) / 86400).cast("long")
    val byDow = events
      .select(pmod(day + 4, lit(7)).as("dow"),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    byDow
      .withColumn("_tot", sum(col("cents")).over(Window.partitionBy()))
      .select(col("dow"), col("n_events"), col("cents"),
        expr("cents * 1000000 div _tot").as("share_micro"),
        expr("cents * 7000000 div _tot").as("index_micro"))
      .orderBy(col("dow"))
  }

  /** Inter-event cadence histogram: the distribution of per-user gaps
    * between consecutive events, in power-of-two second buckets — the
    * activity-rhythm fingerprint that separates bots (sub-second
    * metronomes), notification-driven users (minutes), and habitual
    * ones (daily), and the empirical basis for choosing a session gap
    * instead of folklore-30-minutes.
    *
    * Buckets are INTEGER-exact cross-engine: bucket = digit count of
    * the gap in base 2 (length of `bin(gap)`/`conv(gap,10,2)` — both
    * engines render identical binary strings), i.e. bucket b covers
    * [2^(b−1), 2^b); gap 0 (same-second events) is bucket 0 by
    * definition. No float log2 — a power-of-two boundary never lands
    * on ln(x)/ln(2) ulp.
    *
    * Determinism under tied timestamps: gaps are differences of the
    * SORTED per-user epoch sequence, which is invariant to the
    * arbitrary order within a tie class — the gap multiset is
    * identical however the engine breaks ties.
    *
    * Scale: the lag window partitions BY USER (high-cardinality,
    * evenly spread); the histogram contracts to ≤ ~40 buckets
    * map-side. Output: (bucket, lo_sec, hi_sec, n_gaps). */
  def cadenceHistogram(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col("ep"))
    val gaps = events
      .select(col(userCol),
        expr(s"CAST(floor(unix_timestamp($tsCol)) AS BIGINT)").as("ep"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(byUser))
      .filter(col("gap").isNotNull)
    gaps
      .select(when(col("gap") === 0, lit(0))
        .otherwise(length(conv(col("gap"), 10, 2))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
      .select(col("bucket").cast("long").as("bucket"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("CAST(pow(2, bucket - 1) AS BIGINT)")).as("lo_sec"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("CAST(pow(2, bucket) AS BIGINT) - 1")).as("hi_sec"),
        col("n_gaps"))
      .orderBy(col("bucket"))
  }

  /** Weekly activity-transition audit: per ISO-agnostic epoch week
    * (day div 7), how many users were active, and of those how many
    * were NEW (first-ever week), RETAINED (also active the previous
    * week), RESURRECTED (active before, but not the previous week),
    * plus how many of the week's actives CHURNED (no activity the
    * following week — only reported for weeks before the last observed
    * week, where churn is not right-censored). The growth-accounting
    * decomposition (new + retained + resurrected = active) every
    * engagement dashboard reconciles.
    *
    * Determinism: pure integer week arithmetic over distinct
    * (user, week) rows; counts are exact.
    *
    * Scale: the corpus contracts to distinct (user, week) map-side;
    * the lag/lead/min windows partition BY USER over that contraction
    * (≤ observed weeks per user — bounded and evenly spread, no
    * low-cardinality funnel); the final aggregate contracts to
    * calendar weeks. The global max week moves as a broadcast scalar,
    * not a window. */
  def activityTransitions(events: DataFrame, userCol: String = "user_id",
                          tsCol: String = "ts"): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
      expr(s"CAST(floor(unix_timestamp($tsCol)) AS BIGINT) div 86400 div 7")
        .as("wk")).distinct()
    val byUser = Window.partitionBy(col("u")).orderBy(col("wk"))
    val flagged = uw
      .withColumn("prev", lag(col("wk"), 1).over(byUser))
      .withColumn("next", lead(col("wk"), 1).over(byUser))
      .withColumn("first", min(col("wk")).over(
        Window.partitionBy(col("u"))))
    val maxWk = uw.agg(max(col("wk")).as("max_wk"))
    flagged.crossJoin(broadcast(maxWk))
      .groupBy(col("wk").as("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("wk") === col("first"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("prev") === col("wk") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull && col("prev") < col("wk") - 1, 1L)
          .otherwise(0L)).as("n_resurrected"),
        sum(when(col("wk") < col("max_wk") &&
            (col("next").isNull || col("next") > col("wk") + 1), 1L)
          .otherwise(0L)).as("n_churned_next"))
      .orderBy(col("week"))
  }

  /** Kaplan–Meier survival curve over user lifetimes — the
    * right-censoring-aware answer to "how long do users stay?" that a
    * naive lifetime histogram gets wrong (users still active at the
    * observation edge haven't finished their lifetime; dropping them
    * biases short, counting them as churned biases the hazard).
    * Lifetime = last-active week − first-active week; a user is an
    * observed CHURN if their last week precedes the corpus's last week,
    * CENSORED otherwise (the q155 right-censoring convention). The
    * product-limit estimator S(t) = Π_{s≤t} (1 − d_s/n_s) is reported
    * in log space: `ln_surv_nano` = Σ nano-quantized ln((n_s−d_s)/n_s)
    * — each factor is the ln of an exact rational, quantized BEFORE
    * the sum (the q107 convention), so the running product is an exact
    * integer cumulation and aggregation order can't move the hash
    * (exp(ln_surv_nano/1e9) recovers S(t); the exp is left to the
    * consumer because cross-engine exp is not bit-pinned). If some
    * duration absorbs its whole risk set (d_t = n_t, S hits exactly 0,
    * ln = −∞), that row and all later ones report null.
    *
    * Scale: one distinct (user, week) contraction (exchanges
    * proportional to weekly-active-users, the [[retention]] shape),
    * one per-user min/max aggregate, then everything — risk sets via a
    * reverse cumulative window, the KM cumulation — runs on the
    * DURATION contraction (≤ the corpus's week span in rows), so the
    * unpartitioned windows are gate-legal: bounded by the calendar,
    * never by users. Output one row per observed duration:
    * (duration_weeks, n_at_risk, n_events, n_censored, ln_surv_nano). */
  def survivalCurve(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
      expr(s"CAST(floor(unix_timestamp($tsCol)) AS BIGINT) div 86400 div 7")
        .as("wk")).distinct()
    val spans = uw.groupBy(col("u"))
      .agg(min(col("wk")).as("fw"), max(col("wk")).as("lw"))
    val maxWk = uw.agg(max(col("wk")).as("max_wk"))
    val durs = spans.crossJoin(broadcast(maxWk))
      .groupBy((col("lw") - col("fw")).as("t"))
      .agg(sum(when(col("lw") < col("max_wk"), 1L).otherwise(0L))
          .as("n_events"),
        sum(when(col("lw") === col("max_wk"), 1L).otherwise(0L))
          .as("n_censored"))
    val atRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    durs
      .withColumn("n_at_risk",
        sum(col("n_events") + col("n_censored")).over(atRisk))
      .withColumn("term_nano",
        when(col("n_events") === 0, 0L)
          .when(col("n_at_risk") > col("n_events"),
            round(log((col("n_at_risk") - col("n_events"))
              .cast("double") / col("n_at_risk")) * 1e9).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("absorbed",
        max(when(col("term_nano").isNull, 1).otherwise(0)).over(cum))
      .select(col("t").as("duration_weeks"), col("n_at_risk"),
        col("n_events"), col("n_censored"),
        when(col("absorbed") === 1, lit(null).cast("long"))
          .otherwise(sum(col("term_nano")).over(cum)).as("ln_surv_nano"))
      .orderBy(col("duration_weeks"))
  }
}
