package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the first step of any training-data
  * intake: per-column row/null/distinct counts and numeric min/max/mean.
  *
  * Scan shape (r17 scaladoc correction, from the r16 ADVICE):
  * [[profileApprox]] is ONE pass (a single plain hash aggregate
  * computes every column's stats, HLL sketches for distincts).
  * [[profile]] (exact) is one base-stats pass PLUS one skinny
  * value-contraction subtree per column — |cols|+1 independent reads
  * of `df` (the r16 trade that deleted Catalyst's Expand, which
  * replicated every input row |cols|+1 times through one exchange).
  * Both registered consumers (q36/q146) profile a CACHED base table,
  * where the re-reads are in-memory scans; a caller profiling an
  * EXPENSIVE uncached upstream should `localCheckpoint`/persist a
  * narrow projection first or use `profileApprox`.
  */
object Profiling {

  /** Profile `cols` (numeric columns) of `df`: one output row per
    * column with n, n_null, n_distinct (exact), min/max/mean rounded
    * to 4 via floor-truncation (cross-engine stable for oracle use). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // r16 optimization: multiple exact countDistinct aggregates in ONE
    // agg force Catalyst's Expand plan — every input row is replicated
    // once per distinct column (+1), a (|cols|+1)x scan-equivalent
    // (the profileApprox scaladoc's measured complaint). Instead the
    // base stats run as one plain hash aggregate (no Expand) and each
    // exact distinct count runs as its own value-contraction
    // (map-side-partial distinct, then a count of the survivors) —
    // |cols| skinny single-column passes whose shuffles carry only
    // distinct values. Same exact numbers, same output shape; the
    // subtrees are independent, so one action computes them all with
    // stage-level parallelism.
    val aggs = statAggs(cols, distinctAgg = None)
    val base = df.agg(aggs.head, aggs.tail: _*)
    val nds = cols.map { c =>
      df.select(col(c)).where(col(c).isNotNull).distinct()
        .agg(count(lit(1)).as(s"${c}__dist"))
    }
    // 1-row broadcast cross joins (the library's bounded-seed shape)
    val wide = nds.foldLeft(base)((acc, nd) => acc.crossJoin(broadcast(nd)))
    unpivot(wide, cols)
  }

  /** The 100 TB form of `profile`: HLL++ sketches
    * (approx_count_distinct, `rsd` relative error) replace the exact
    * distinct counts. Multiple EXACT countDistinct aggregates force
    * Catalyst's Expand plan — every input row is replicated once per
    * distinct column (+1), a 5× scan-equivalent for a 4-column profile
    * — while the sketch variant stays a single plain hash aggregate
    * with constant-size partial buffers. No DuckDB oracle (HLL
    * implementations differ across engines); ProfilingSpec pins the
    * estimates to the exact profile within tolerance. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.02): DataFrame = {
    val aggs = statAggs(cols,
      distinctAgg = Some(c => approx_count_distinct(c, rsd)))
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The shared six-stat aggregate list; only the distinct-count
    * strategy differs between the exact and approximate profiles.
    * `distinctAgg = None` omits the distinct column entirely (the
    * exact profile derives it from per-column value contractions —
    * see [[profile]]). */
  private def statAggs(cols: Seq[String],
                       distinctAgg: Option[Column => Column])
      : Seq[Column] = {
    val t4 = TextAnalysis.trunc4 _
    cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__null")) ++
      distinctAgg.map(da => da(col(c)).as(s"${c}__dist")).toSeq ++
      Seq(
        t4(min(col(c)).cast("double")).as(s"${c}__min"),
        t4(max(col(c)).cast("double")).as(s"${c}__max"),
        t4(avg(col(c).cast("double"))).as(s"${c}__mean"))
    }
  }

  /** Join/group-key skew diagnostics — the pre-flight every large
    * shuffle deserves: per-key frequencies contracted to
    * (n_keys, n_rows, top-1 share, top-`topK` share, Gini). A Gini near
    * 0 means uniform keys (hash partitioning will balance); near 1
    * means a handful of hot keys own the table and the downstream
    * join/agg needs salting or AQE skew handling (see ops/SkewJoin).
    *
    * Gini over the ranked key-count sequence x₁ ≤ … ≤ xₙ:
    * G = (2·Σ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n — computed from exact integer
    * aggregate sums, one double division at the end.
    *
    * No per-key ranking anywhere: all tied keys share a count value,
    * so every ranked sum is a CLOSED FORM over the (count value,
    * #keys with that count) contraction — a block of m keys tied at
    * cnt occupies ranks start+1..start+m and contributes
    * cnt·(m·cum − m(m−1)/2) to Σ i·xᵢ (cum = keys with cnt ≤ this,
    * an arithmetic-series sum independent of intra-block order), and
    * the top-K mass clamps K against the descending cumulative key
    * count. Identical five outputs to the row_number formulation
    * (ExtSpec pins equality), without its single-partition window
    * over the key contraction.
    *
    * Scale: the only full-data pass is the per-key count (map-side
    * partial). The cumulative windows run on the DISTINCT-COUNT-VALUE
    * contraction, whose size k obeys k(k+1)/2 ≤ n_rows (distinct
    * positive counts sum past any budget), so k ≤ √(2·n_rows) —
    * ~1.4M values even at 10¹² rows; the one-task window is bounded
    * by arithmetic, not by hoping keys contract. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val g = counts.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val wAsc = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cum_asc", sum(col("m")).over(wAsc))
      .withColumn("n_keys", sum(col("m")).over(Window.partitionBy()))
    // keys with a STRICTLY larger cnt = n_keys − cum_asc; this block's
    // share of the descending top-K is K − (n_keys − cum_asc), clamped
    // to [0, m] — tie order is irrelevant because tied keys have equal
    // cnt, so any m-subset of a tie block carries the same mass
    def inTop(k: Long) = greatest(lit(0L), least(col("m"),
      lit(k) - col("n_keys") + col("cum_asc")))
    cum.agg(
      max(col("n_keys")).as("n_keys"),
      sum(col("cnt") * col("m")).as("n_rows"),
      sum(expr("cnt * (m * cum_asc - (m * (m - 1)) div 2)")).as("iwsum"),
      sum(col("cnt") * inTop(1L)).as("top1"),
      sum(col("cnt") * inTop(topK.toLong)).as("topk"))
      .select(col("n_keys"), col("n_rows"),
        round(col("top1").cast("double") / col("n_rows"), 6)
          .as("top1_share"),
        round(col("topk").cast("double") / col("n_rows"), 6)
          .as(s"top${topK}_share"),
        round(
          lit(2.0) * col("iwsum") /
            (col("n_keys").cast("double") * col("n_rows")) -
            (col("n_keys") + lit(1)).cast("double") / col("n_keys"), 6)
          .as("gini"))
  }

  /** Coverage-concentration curve: the SMALLEST number of keys whose
    * rows cover p% of the table, for each requested percent — "the top
    * k50 domains own half the corpus" in one row. The planning twin of
    * [[keySkew]]'s Gini: Gini says HOW unequal, k@p says WHERE to
    * spend crawl/clean/quota budget.
    *
    * Exact and closed-form over tie blocks (no per-key ranking): keys
    * tied at count c are interchangeable, so within the first
    * descending-count block that reaches the target row mass,
    * k = keys_before + ceil((target − rows_before)/c) — integer
    * arithmetic throughout, target = ceil(p·n/100).
    *
    * Scale: per-key counts contract map-side; the cumulative windows
    * run on the DISTINCT-COUNT-VALUE contraction, bounded by
    * √(2·n_rows) (the [[keySkew]] argument — distinct positive counts
    * sum past any budget). Output one row:
    * (n_rows, n_keys, k<p1>, k<p2>, …). */
  def coverageK(df: DataFrame, keyCol: String,
                percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      "percents must be in (0, 100]")
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val g = counts.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val desc = Window.orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val cum = g
      .withColumn("cum_rows", sum(col("cnt") * col("m")).over(desc))
      .withColumn("cum_keys", sum(col("m")).over(desc))
      .withColumn("n_rows", sum(col("cnt") * col("m")).over(all))
      .withColumn("n_keys", sum(col("m")).over(all))
      .withColumn("rows_before", col("cum_rows") - col("m") * col("cnt"))
      .withColumn("keys_before", col("cum_keys") - col("m"))
    // integer `div` via expr — the Column `/` operator is double
    // division and would float the key count
    val ks = percents.map { p =>
      min(expr(
        s"CASE WHEN cum_rows >= ($p * n_rows + 99) div 100 " +
        s"AND rows_before < ($p * n_rows + 99) div 100 " +
        s"THEN keys_before + ((($p * n_rows + 99) div 100) " +
        s"- rows_before + cnt - 1) div cnt END")).as(s"k$p")
    }
    val aggs = Seq(max(col("n_keys")).as("n_keys")) ++ ks
    cum.agg(max(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** Pre-flight join-cardinality audit: the EXACT output row count a
    * key equi-join would produce — Σ over common keys of
    * cnt_left·cnt_right — plus the diagnostics that say WHY
    * (matching-key counts, the worst single key's contribution). The
    * planning step before any 100 TB join: a join that looks 1:1 but
    * hides a few many:many keys explodes quadratically, and this
    * reports it from two cheap contractions before the shuffle finds
    * out the hard way. Pairs with [[keySkew]] (per-side skew) the way
    * EXPLAIN pairs with statistics.
    *
    * One row out: (n_left, n_right, n_keys_left, n_keys_right,
    * n_keys_common, out_rows, max_key_out).
    *
    * Scale: two map-side-combined per-key counts; the contraction
    * equi-join is key-cardinality-sized; the per-key product needs
    * cnt_l·cnt_r within int64 (both sides >3·10⁹ rows on ONE key
    * overflows — at which point the real answer is "salt or rethink
    * the join", and ANSI mode fails loudly); the row-count-scaled SUM
    * accumulates as decimal(38,0).
    *
    * Checkpoint lifetime: the two key contractions are EAGERLY
    * localCheckpointed at call time (jobs run before the caller's
    * action) and their blocks are caller-owned — they free when the
    * ContextCleaner GCs the returned plan's RDDs, so hold the result,
    * not the operator call, in long-lived references. localCheckpoint
    * trades fault tolerance for speed: on a real cluster an executor
    * loss invalidates the checkpointed blocks and fails the query
    * (rerun the audit — it is a pre-flight diagnostic, not a pipeline
    * stage); use reliable checkpointing instead where that retry is
    * unacceptable. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      keyL: String, keyR: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // each contraction has two consumers (its side totals and the
    // common-key join) whose subplans differ — the join side gains an
    // isnotnull(k) filter — so exchange reuse does NOT dedup them and
    // the raw table would scan twice (verified in the formatted plan);
    // materializing the key-cardinality contraction keeps the audit at
    // one scan per side, the whole point of a pre-flight check
    val cl = left.groupBy(col(keyL).as("k")).agg(count(lit(1)).as("cl"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val cr = right.groupBy(col(keyR).as("k")).agg(count(lit(1)).as("cr"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val ltot = cl.agg(coalesce(sum(col("cl")), lit(0L)).as("n_left"),
      count(lit(1)).as("n_keys_left"))
    val rtot = cr.agg(coalesce(sum(col("cr")), lit(0L)).as("n_right"),
      count(lit(1)).as("n_keys_right"))
    // per-key products and their max/sum run ENTIRELY in decimal(38,0)
    // — a hot key's cl·cr crosses int64 around 3e9×3e9, and the
    // long-product-then-cast form overflows BEFORE the cast sees it
    cl.join(cr, Seq("k"))
      .agg(count(lit(1)).as("n_keys_common"),
        coalesce(sum(col("cl").cast("decimal(38,0)") * col("cr"))
          .cast("long"), lit(0L)).as("out_rows"),
        coalesce(max(col("cl").cast("decimal(38,0)") * col("cr"))
          .cast("long"), lit(0L)).as("max_key_out"))
      .crossJoin(broadcast(ltot)).crossJoin(broadcast(rtot))
      .select(col("n_left"), col("n_right"), col("n_keys_left"),
        col("n_keys_right"), col("n_keys_common"), col("out_rows"),
        col("max_key_out"))
  }

  /** Pre-flight join STRATEGY audit — [[joinCardinality]]'s stats
    * folded into the decision a 100 TB join planner actually makes,
    * as one deterministic row. The derivation ladder (all exact
    * integer arithmetic, oracle-replayable):
    *
    *  1. the smaller side fits the broadcast budget → `broadcast`
    *     (no shuffle at all; skew is irrelevant to a broadcast-hash
    *     probe);
    *  2. else `shuffle`, prefixed `bloom_` when under half the
    *     LARGER side's rows have a matching key (the
    *     [[graft.ops.RuntimeFilters.bloomPrunedJoin]] win condition:
    *     most probe rows die before the exchange), and suffixed
    *     `_salted` when one key contributes more than
    *     `skewLimitMicro` of the join output (the
    *     [[graft.ops.SkewJoin.saltedEquiJoin]] condition — AQE's
    *     skew split has the same trigger shape at runtime; this is
    *     the plan-ahead form).
    *
    * Emits (n_left, n_right, n_keys_common, out_rows, max_key_out,
    * matched_left, matched_right, probe_match_micro, skew_micro,
    * strategy). Thresholds are parameters: `broadcastRowLimit` is a
    * ROW proxy for spark.sql.autoBroadcastJoinThreshold's byte budget
    * (callers translate via their row width), pinned small in tests
    * to exercise the non-broadcast branches.
    *
    * Scale: identical cost shape to [[joinCardinality]] — two
    * map-side-combined key contractions, one key-cardinality join,
    * decimal(38,0) row-scaled sums. */
  /** [[joinStrategyAudit]]'s output column names, in order — the reuse
    * seam for callers prefixing a label column before a union. */
  val auditCols: Seq[String] = Seq("n_left", "n_right", "n_keys_common",
    "out_rows", "max_key_out", "matched_left", "matched_right",
    "probe_match_micro", "skew_micro", "strategy")

  def joinStrategyAudit(left: DataFrame, right: DataFrame,
                        keyL: String, keyR: String,
                        broadcastRowLimit: Long = 10000000L,
                        skewLimitMicro: Long = 100000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cl = left.groupBy(col(keyL).as("k")).agg(count(lit(1)).as("cl"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val cr = right.groupBy(col(keyR).as("k")).agg(count(lit(1)).as("cr"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val ltot = cl.agg(coalesce(sum(col("cl")), lit(0L)).as("n_left"))
    val rtot = cr.agg(coalesce(sum(col("cr")), lit(0L)).as("n_right"))
    // per-key products, their sum/max, and the ×1e6 skew numerator all
    // run in decimal(38,0) — a hot key's cl·cr overflows a long product
    // past ~9.2e18, and even a valid max_key_out > ~9.2e12 would
    // overflow the micro multiply, silently corrupting the _salted
    // decision at exactly the scale the audit targets. Longs reappear
    // only on output (the emitted columns keep their BIGINT schema).
    val common = cl.join(cr, Seq("k"))
      .agg(count(lit(1)).as("n_keys_common"),
        coalesce(sum(col("cl").cast("decimal(38,0)") * col("cr")),
          lit(0).cast("decimal(38,0)")).as("_out_dec"),
        coalesce(max(col("cl").cast("decimal(38,0)") * col("cr")),
          lit(0).cast("decimal(38,0)")).as("_mko_dec"),
        coalesce(sum(col("cl")), lit(0L)).as("matched_left"),
        coalesce(sum(col("cr")), lit(0L)).as("matched_right"))
      .withColumn("out_rows", col("_out_dec").cast("long"))
      .withColumn("max_key_out", col("_mko_dec").cast("long"))
    val probeMatch = expr(
      """CASE WHEN n_left >= n_right
        |  THEN coalesce(matched_left * 1000000 div nullif(n_left, 0), 0)
        |  ELSE coalesce(matched_right * 1000000 div nullif(n_right, 0), 0)
        |END""".stripMargin)
    val skew = expr(
      "coalesce(_mko_dec * 1000000 div nullif(_out_dec, 0), 0)")
    common.join(broadcast(ltot), lit(true), "left")
      .join(broadcast(rtot), lit(true), "left")
      .withColumn("probe_match_micro", probeMatch)
      .withColumn("skew_micro", skew)
      .withColumn("strategy",
        when(least(col("n_left"), col("n_right")) <= broadcastRowLimit,
          lit("broadcast"))
        .otherwise(concat(
          when(col("probe_match_micro") < 500000L, lit("bloom_"))
            .otherwise(lit("")),
          lit("shuffle"),
          when(col("skew_micro") > skewLimitMicro, lit("_salted"))
            .otherwise(lit("")))))
      .select(col("n_left"), col("n_right"), col("n_keys_common"),
        col("out_rows"), col("max_key_out"), col("matched_left"),
        col("matched_right"), col("probe_match_micro"),
        col("skew_micro"), col("strategy"))
  }

  /** Act on the advisor: run [[joinStrategyAudit]] and ROUTE the join
    * to the implementation its strategy row names — the planner loop
    * closed. `left` is the probe/fact side and `right` the build/dim
    * side (the bloom builds on `right`, salting replicates `right`,
    * exactly as in the underlying operators). Every branch is
    * row-identical to `left.join(right, keyL === keyR)` — broadcast
    * is a hint, the bloom has no false negatives and its false
    * positives die in the exact join, salting is row-for-row
    * equivalent (each piece spec-verified) — so dispatch changes the
    * PLAN, never the result.
    *
    * Returns (strategy, joined): the decision rides alongside the
    * frame so pipelines can log/gate it without a second audit.
    *
    * Scale: the audit's one-row result is collected at plan time (a
    * bounded driver model — two key contractions reduced to scalars,
    * the [[graft.ext.Similarity.ivfAssign]] eagerness class); the
    * joined frame itself stays fully lazy/distributed. The audit scans
    * both inputs once — a pre-flight cost the routed plan amortizes;
    * pipelines that already hold the audit row route by hand. */
  def dispatchJoin(left: DataFrame, right: DataFrame,
                   keyL: String, keyR: String,
                   broadcastRowLimit: Long = 10000000L,
                   skewLimitMicro: Long = 100000L,
                   salt: Int = 16): (String, DataFrame) = {
    val row = joinStrategyAudit(left, right, keyL, keyR,
      broadcastRowLimit, skewLimitMicro).collect()(0)
    val strategy = row.getAs[String]("strategy")
    val joined = strategy match {
      case "broadcast" =>
        if (row.getAs[Long]("n_right") <= row.getAs[Long]("n_left"))
          left.join(broadcast(right), col(keyL) === col(keyR))
        else broadcast(left).join(right, col(keyL) === col(keyR))
      case "bloom_shuffle" =>
        graft.ops.RuntimeFilters.bloomPrunedJoin(left, right, keyL, keyR)
      case "bloom_shuffle_salted" =>
        graft.ops.RuntimeFilters.bloomPrunedSkewJoin(left, right,
          keyL, keyR, salt)
      case "shuffle_salted" =>
        graft.ops.SkewJoin.saltedEquiJoin(left, right, keyL, keyR, salt)
      case _ =>
        left.join(right, col(keyL) === col(keyR))
    }
    (strategy, joined)
  }

  /** Heavy-hitter audit via the Misra-Gries mergeable summary
    * ([[graft.functions.SketchAggregates.mg_summary]]): one
    * O(capacity)-state pass finds the candidate set, a second pass
    * recounts ONLY the candidates exactly (broadcast semi-join — the
    * shuffle carries ≤ capacity keys, never the key universe). The
    * classical guarantee: every key with true frequency > n/capacity
    * is in the summary, so counting candidates finds ALL true heavy
    * hitters without ever building the full per-key contraction —
    * the point at 100 TB, where the keySkew-style exact contraction
    * is itself the expensive step.
    *
    * Output (one row): (n_rows, capacity, threshold, n_true_hh) with
    * threshold = n_rows div capacity and n_true_hh = candidates whose
    * EXACT count exceeds it. Deterministic even though the summary
    * CONTENT is merge-order-dependent: only sub-threshold candidates
    * vary run to run, and they are filtered by the exact recount.
    * The q140 oracle computes n_true_hh from the FULL exact counts —
    * a red row would mean the MG guarantee was violated (a missed
    * heavy hitter), making the sketch tier's correctness
    * driver-visible, the q136 pattern. */
  def heavyHitters(df: DataFrame, keyCol: String,
                   capacity: Int = 64): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as("k"))
    // one pass: the MG summary and the row count ride the same
    // aggregate — ONE row always, so the output survives an empty or
    // fully-decremented candidate set (an all-null row here was the
    // first formulation's bug)
    val summary = keys
      .agg(graft.functions.SketchAggregates
          .mg_summary(capacity)(col("k")).as("mg"),
        count(lit(1)).as("n_rows"))
      .localCheckpoint(true) // two consumers of the O(capacity) row
    val cand = summary.select(col("n_rows"),
      explode(map_keys(col("mg"))).as("k"))
    val found = keys
      .join(broadcast(cand.select(col("k"))), Seq("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(cand), Seq("k"))
      .agg(coalesce(
        sum(when(col("cnt") > expr(s"n_rows div $capacity"), 1L)
          .otherwise(0L)), lit(0L)).as("n_true_hh"))
    summary
      .select(col("n_rows"), lit(capacity.toLong).as("capacity"),
        expr(s"n_rows div $capacity").as("threshold"))
      .crossJoin(broadcast(found))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the value
    * distributions of side 0 and side 1 — the EXACT distribution-shift
    * test (max |F₀(v) − F₁(v)| over the pooled support) that
    * complements [[psiDrift]] (bucketed, approximate) when the answer
    * has to be defensible: did this week's value distribution actually
    * move? Takes an INTEGER value column (quantize first — the repo
    * convention; for a truly unbounded domain quantize COARSER, which
    * only lowers resolution, never validity).
    *
    * Determinism: the sup is taken over INTEGER cross-multiplied
    * differences — |c₀·n₁ − c₁·n₀| as decimal(38,0), exact at any row
    * count — and only the final max is divided once into micro units.
    *
    * Scale: one hash aggregate contracts the corpus to its distinct
    * value domain with both sides' counts on the same row, so the
    * cumulative window is VALUE-DOMAIN-sized; it is unpartitioned
    * (gate-legal: directly over the contraction) because KS needs one
    * global ordered pass — bounded by the quantized domain, never by
    * rows. Output one row: (n_0, n_1, n_values, ks_micro). */
  def ksTest(df: DataFrame, valueCol: String, sideCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = df.select(sideCol.cast("int").as("side"),
        col(valueCol).as("v"))
      .groupBy(col("v"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("w0"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("w1"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    c.withColumn("c0", sum(col("w0")).over(cum))
      .withColumn("c1", sum(col("w1")).over(cum))
      .withColumn("n0", sum(col("w0")).over(all))
      .withColumn("n1", sum(col("w1")).over(all))
      .select(col("n0"), col("n1"),
        // cast BEFORE multiplying (the oracle's HUGEINT shape) — an
        // int64 product of c·n overflows past ~3·10⁹ rows/side and a
        // post-hoc cast can't undo it
        abs(col("c0").cast("decimal(38,0)") * col("n1") -
          col("c1").cast("decimal(38,0)") * col("n0")).as("d"))
      .agg(max(col("n0")).as("n_0"), max(col("n1")).as("n_1"),
        count(lit(1)).as("n_values"),
        round(max(col("d")).cast("double") * 1e6 /
          (max(col("n0")).cast("double") * max(col("n1"))))
          .cast("long").as("ks_micro"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) between the value
    * distributions of side 0 and side 1 — the rank-based LOCATION-shift
    * companion of [[ksTest]] (which is shape-sensitive): robust to
    * outliers and any monotone transform of the values, the standard
    * "did the median move?" test when normality can't be assumed. Takes
    * an INTEGER value column (quantize first — the repo convention).
    *
    * Closed form over the value contraction, no per-row ranking: with
    * per-value counts (a_v, b_v) and A_below(v) = Σ_{u<v} a_u,
    * U_b = Σ_v b_v·(A_below(v) + a_v/2); doubled to keep it integral:
    * 2·U_b = Σ_v b_v·(2·A_below + a_v), accumulated EXACTLY in
    * decimal(38,0) (2U ≤ 2·n² overflows int64 past ~2·10⁹ rows). The
    * normal approximation uses the tie-corrected variance
    * σ² = (n₀n₁/12)·[(n+1) − Σ t_v(t_v²−1)/(n(n−1))], t_v = a_v+b_v —
    * a handful of IEEE double ops on exact integers at the very end
    * (the ksTest determinism recipe).
    *
    * Scale: identical shape to [[ksTest]] — one hash aggregate to the
    * distinct-value domain, one unpartitioned cumulative window OVER
    * THE CONTRACTION (gate-legal: bounded by the quantized domain,
    * never by rows). Output one row:
    * (n_0, n_1, n_values, u2_b, z_micro). */
  def mannWhitney(df: DataFrame, valueCol: String,
                  sideCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = df.select(sideCol.cast("int").as("side"),
        col(valueCol).as("v"))
      .groupBy(col("v"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
    val below = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val t = col("a") + col("b")
    val withCum = c
      .withColumn("a_below", coalesce(sum(col("a")).over(below), lit(0L)))
      .withColumn("n0", sum(col("a")).over(all))
      .withColumn("n1", sum(col("b")).over(all))
    withCum
      .select(col("n0"), col("n1"),
        (col("b").cast("decimal(38,0)") *
          (lit(2) * col("a_below") + col("a"))).as("u2_term"),
        // tie term t(t²−1) as decimal: t ≤ n, cube overflows int64
        // past t ~ 2·10⁶
        (t.cast("decimal(38,0)") * t * t - t).as("tie_term"))
      .agg(max(col("n0")).as("n_0"), max(col("n1")).as("n_1"),
        count(lit(1)).as("n_values"),
        sum(col("u2_term")).as("u2_b"),
        sum(col("tie_term")).as("ties"))
      // 2U accumulates exactly in decimal(38,0); the OUTPUT is cast to
      // long by the giniByGroup convention (2U ≤ n²/2 fits int64 up to
      // n ≈ 4·10⁹ rows — past that, widen the output type, not the sum)
      .select(col("n_0"), col("n_1"), col("n_values"),
        col("u2_b").cast("long").as("u2_b"), {
        val n0 = col("n_0").cast("double")
        val n1 = col("n_1").cast("double")
        val n = n0 + n1
        val mean2 = n0 * n1 // 2·E[U] = n0·n1
        val variance = n0 * n1 / 12.0d *
          ((n + 1) - col("ties").cast("double") / (n * (n - 1)))
        when(variance > 0,
          round((col("u2_b").cast("double") - mean2) /
            (lit(2.0d) * sqrt(variance)) * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("z_micro")
      })
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the hypothesis-test companion of [[mutualInfo]] (same
    * cell contraction, a test statistic instead of an information
    * measure): χ² = Σ (observed − expected)²/expected with
    * expected = row·col margins / n, plus the degrees of freedom
    * (|X|−1)(|Y|−1) the consumer needs to look the statistic up.
    *
    * EMPTY grid cells (observed 0, expected > 0) are NOT skipped: each
    * contributes exactly its expected count e to χ², and since
    * Σ_all_cells e = n, the whole statistic folds to the closed form
    * χ² = n + Σ_observed[(o−e)²/e − e] — one pass over observed cells,
    * no grid densification.
    *
    * Determinism: counts are exact integers; each observed cell's
    * adjusted term is nano-quantized to BIGINT before the final sum
    * (the q121/q133 convention), so aggregation order cannot move the
    * hash.
    *
    * Scale: one (x, y) hash aggregate contracts the table map-side;
    * margins are window sums OVER THE CONTRACTION; the final
    * aggregate (including the two distinct margin counts) runs on
    * |X|·|Y| cells. Cardinalities past ~10⁶ cells want the sketch
    * tier, not an exact test. Output one row:
    * (n, n_cells, dof, chi2_micro). */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val cells = joint
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    val e = col("nx").cast("double") * col("ny") / col("n")
    cells
      .select(col("x"), col("y"), col("nxy"), col("n"),
        round(((col("nxy") - e) * (col("nxy") - e) / e - e) * 1e9)
          .cast("long").as("t_nano"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        ((countDistinct(col("x")) - 1) * (countDistinct(col("y")) - 1))
          .as("dof"),
        (max(col("n")) * 1000000L +
          round(sum(col("t_nano")) / 1e3).cast("long")).as("chi2_micro"))
  }

  /** Pairwise Pearson correlation of numeric columns — the feature-
    * redundancy screen of a stats profile. One pass, one row out per
    * unordered column pair.
    *
    * Determinism: values are e4-quantized to integers first; every
    * accumulated sum (Σx, Σx², Σxy) is EXACT integer arithmetic in
    * decimal(38,0) — far past int64, which the cross-products would
    * overflow at ~1e9 rows — so the shuffle-order-sensitive part of the
    * computation is exact, and the final correlation is a handful of
    * identical IEEE double ops per pair on both engines.
    *
    * Scale: a single aggregate with 2c + c(c−1)/2 + 1 accumulators (c
    * columns); partial aggregation makes the shuffle one buffer row
    * per partition. The c² blow-up is in ACCUMULATOR count, not data —
    * fine for profile-sized c (≤ ~30 columns), and never a second scan. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    // columns stay LONG so every per-row product is a codegen'd long
    // multiply; only the SUM accumulates as decimal(38,0).
    // VALUE-MAGNITUDE BOUND: a single product q_a·q_b fits int64 only
    // while |x| ≤ ~3·10⁵ (|q| = |x|·1e4 ≤ 3.03·10⁹ ⇒ product ≤
    // 9.2·10¹⁸); the fixture columns are prices/quantities well inside
    // it. Past the bound the product does NOT corrupt silently: the
    // session runs Spark 4 ANSI mode (no override anywhere in this
    // repo), so long·long overflow raises ARITHMETIC_OVERFLOW and the
    // query fails loudly — the documented remedies are coarser
    // quantization (1e2 buys 100× headroom at 2 fewer digits) or
    // casting one factor to decimal before the multiply (exact at any
    // range, at the ~40× hot-loop cost measured below). It is the
    // row-count-scaled SUM that needs decimal, not the product. (The
    // first formulation quantized the columns straight to decimal,
    // making every row's multiply a BigDecimal allocation: 279 s for
    // 60M rows vs 6.8 s after this change — a 40× hot-loop tax for
    // exactness the product never needed, plus enough tenured garbage
    // to slow the NEXT query by 10× on GC alone.)
    // ARITHMETIC quantization, not round(): Spark's double round runs
    // BigDecimal.valueOf per VALUE (shortest-decimal-string HALF_UP) —
    // measured ~7 s of an 18M-row × 4-column pass on the conversions
    // alone. floor(y+0.5) (mirrored for negatives) is half-away-from-
    // zero — DuckDB round's actual semantics, so if anything CLOSER to
    // the oracle than Spark's string-based round; the two can only
    // disagree where y sits within one double ulp of a .5 boundary,
    // which price-like inputs (≤ 2 decimal digits, so y = x·10⁴ lands
    // at multiples of 100 up to float error) never produce.
    val q = cols.map { c =>
      val y = col(c).cast("double") * 1e4
      when(y >= 0, floor(y + 0.5)).otherwise(-floor(-y + 0.5))
        .cast("long").as(c)
    }
    // TWO-LEVEL EXACT ACCUMULATION: the straightforward
    // sum(product.cast(decimal)) pays a per-row Decimal conversion +
    // non-primitive add for every one of the 2c + c(c−1)/2 moments —
    // measured ~20 s for 18M rows × 4 columns (30× probe), all of it
    // decimal overhead, none of it arithmetic. Instead each int64
    // product is split into (hi, lo) = (p div 2³¹, p % 2³¹) — an exact
    // identity for Spark's truncating div/% pair, signs included — and
    // summed as plain codegen LONGS per hash bucket; the 2³¹-weighted
    // decimal reconstruction then runs over the `buckets`-row frame,
    // not the corpus. Exactness bound: per-bucket long sums stay inside
    // int64 while rows/bucket ≤ ~2·10⁹ (hi, |q| ≤ 3.03·10⁹ each) —
    // n ≤ ~2·10¹² rows at the default 1024 buckets, and ANSI mode
    // fails loudly past it (raise `buckets`, same remedy family as the
    // value-magnitude bound above).
    val buckets = 1024
    val half = 1L << 31
    val base = df.select(q: _*)
      .withColumn("_b", pmod(xxhash64(cols.map(col): _*), lit(buckets)))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // self-products (the ss_ moments) ride the same hi/lo split
    val prods = cols.map(c => (c, c)) ++ pairs
    def hiN(a: String, b: String) = s"_hi_${a}__$b"
    def loN(a: String, b: String) = s"_lo_${a}__$b"
    val partial = base.groupBy(col("_b")).agg(
      count(lit(1)).as("_n"),
      (cols.map(c => sum(col(c)).as(s"_s_$c")) ++
        prods.flatMap { case (a, b) => Seq(
          sum(expr(s"($a * $b) div $half")).as(hiN(a, b)),
          sum(expr(s"($a * $b) % $half")).as(loN(a, b)))
        }): _*)
    def dec(c: Column) = c.cast("decimal(38,0)")
    def rebuild(a: String, b: String) =
      sum(dec(col(hiN(a, b)))) * half + sum(dec(col(loN(a, b))))
    val finals =
      Seq(sum(dec(col("_n"))).as("n")) ++
      cols.map(c => sum(dec(col(s"_s_$c"))).as(s"s_$c")) ++
      cols.map(c => rebuild(c, c).as(s"ss_$c")) ++
      pairs.map { case (a, b) => rebuild(a, b).as(s"sp_${a}__$b") }
    val one = partial.agg(finals.head, finals.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("n").cast("double")
      def d(name: String) = col(name).cast("double")
      val cov = n * d(s"sp_${a}__$b") - d(s"s_$a") * d(s"s_$b")
      val vx = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vy = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Population stability index of a numeric column between a
    * reference snapshot (snap=0) and a current one (snap=1) — the
    * standard ML-monitoring drift score: bucket by the REFERENCE's
    * decile cutpoints, psi = Σ (q−p)·ln(q/p) over buckets (p =
    * reference share, q = current share). Rule of thumb: <0.1 stable,
    * 0.1-0.25 moderate shift, >0.25 investigate. Complements
    * [[TextAnalysis.tokenDrift]] (token-level JSD) with
    * numeric-distribution drift.
    *
    * Cutpoints come from approx_percentile — at the default accuracy
    * 10⁶ they are exact data elements at oracle scale (the q69
    * convention, mirrored by DuckDB quantile_disc). `accuracy` is the
    * scale lever: the sketch cost is ~4× between 10⁶ and 10⁴ (22.4 vs
    * 5.9 s at 10M rows, probed), and decile CUTPOINTS only need
    * percentile resolution, not element exactness — production wants
    * 10⁴; 10⁶ exists for the bit-exact oracle. The one-row cutpoint
    * array broadcasts; per-row bucketing is a codegen'd 9-comparison
    * chain. A bucket empty on either side contributes no term
    * (reported via n_scored_buckets so silence is visible).
    *
    * Determinism: values cents-quantized before everything; bucket
    * counts exact integers; per-bucket terms nano-quantized pre-sum.
    * Output: one row (n_ref, n_cur, n_buckets, n_scored_buckets,
    * psi_micro). */
  def psiDrift(df: DataFrame, valueCol: String, snapshotCol: Column,
               buckets: Int = 10, accuracy: Int = 1000000): DataFrame = {
    val v = df.select(snapshotCol.cast("int").as("snap"),
      round(col(valueCol) * 100).cast("long").as("cents"))
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val cuts = v.filter(col("snap") === 0)
      .agg(expr(s"approx_percentile(cents, array(${ps.mkString(",")}), $accuracy)")
        .as("cs"))
    // bucket = number of cutpoints strictly below the value, as an
    // explicit when-chain over element_at — codegen'd, unlike the
    // interpreted filter()-HOF form (worth ~3 s of 25 at 10M rows;
    // the dominant cost is the cutpoint sketch, see the accuracy note
    // in the scaladoc)
    val bucketExpr = (1 until buckets)
      .map(i => when(col("cents") > element_at(col("cs"), i), 1).otherwise(0))
      .reduce(_ + _)
    val bucketed = v.crossJoin(broadcast(cuts))
      .select(col("snap"), bucketExpr.as("bucket"))
    val cnt = bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("snap") === 0, 1L).otherwise(0L)).as("r"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("c"))
    val tot = cnt.agg(sum(col("r")).as("tr"), sum(col("c")).as("tc"))
    val p = col("r").cast("double") / col("tr")
    val q = col("c").cast("double") / col("tc")
    cnt.crossJoin(broadcast(tot))
      .select(col("r"), col("c"), col("tr"), col("tc"),
        when(col("r") > 0 && col("c") > 0,
          round((q - p) * log(q / p) * 1e9).cast("long"))
          .otherwise(lit(0L)).as("t_nano"),
        when(col("r") > 0 && col("c") > 0, 1L).otherwise(0L).as("scored"))
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"),
        count(lit(1)).as("n_buckets"), sum(col("scored")).as("n_scored_buckets"),
        round(sum(col("t_nano")) / 1e3).cast("long").as("psi_micro"))
  }

  /** Benford first-digit audit of a positive numeric column — the
    * data-forensics screen for fabricated or truncated numerics
    * (naturally-occurring multiplicative data follows
    * P(d) = log10(1 + 1/d); uniform or hand-entered data does not).
    * Output: one row per digit 1-9 with observed count, observed and
    * expected shares, plus the chi-square contribution — consumers
    * threshold the total χ² or eyeball the per-digit deviation.
    *
    * A HIGH χ² is not fraud per se (bounded-range data like
    * percentages legitimately deviates); the operator reports the
    * deviation, interpretation stays with the caller.
    *
    * Determinism: first digit extracted lexically from the absolute
    * value (no log10 on the hot path, no float-pow drift); counts are
    * exact integers; the χ² terms and shares are micro/nano-quantized
    * scalar math on the 9-row contraction. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digit = substring(regexp_replace(
      abs(col(valueCol)).cast("string"), "[^1-9]", ""), 1, 1)
    val counts = df
      .filter(col(valueCol).isNotNull && abs(col(valueCol)) > 0)
      .select(digit.as("digit"))
      .filter(col("digit") =!= "")
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    counts
      .withColumn("tot", sum(col("n")).over(total))
      .withColumn("p_obs", col("n").cast("double") / col("tot"))
      .withColumn("p_exp",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
      .select(col("digit"), col("n"),
        round(col("p_obs") * 1e6).cast("long").as("obs_micro"),
        round(col("p_exp") * 1e6).cast("long").as("exp_micro"),
        round((col("p_obs") - col("p_exp")) * (col("p_obs") - col("p_exp"))
          / col("p_exp") * 1e9).cast("long").as("chi2_nano"))
      .orderBy(col("digit"))
  }

  /** Mutual information (nats) between two categorical columns, plus
    * both marginal entropies and the normalized MI — the dependence
    * screen for dataset design (is `source` just a proxy for `lang`?
    * does the split correlate with the label?). MI = 0 ⇔ independent;
    * NMI = MI/√(H(x)·H(y)) ∈ [0,1] when both entropies are positive.
    *
    * Determinism: all distributions come from exact integer counts;
    * each cell's p·ln term is nano-quantized to a BIGINT before the
    * final sum (the q107 convention), so aggregation order can't move
    * the hash.
    *
    * Scale: one (x,y) count aggregate contracts the table map-side;
    * margins come from window sums OVER THE CONTRACTION (|X|·|Y|
    * cells), so nothing downstream of the first aggregate sees row
    * counts. Cardinalities beyond ~10⁶ cells want the sketch tier, not
    * this exact op. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val cells = joint
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    val dbl = (c: Column) => c.cast("double")
    val miTerm = dbl(col("nxy")) / dbl(col("n")) *
      log(dbl(col("nxy")) * dbl(col("n")) / (dbl(col("nx")) * dbl(col("ny"))))
    // marginal-entropy terms divided across the cells of each margin
    // (each x-row carries its share nxy/nx of x's entropy term), so one
    // pass over the cell frame yields MI and both entropies together
    val hxTerm = dbl(col("nxy")) / dbl(col("n")) *
      -log(dbl(col("nx")) / dbl(col("n")))
    val hyTerm = dbl(col("nxy")) / dbl(col("n")) *
      -log(dbl(col("ny")) / dbl(col("n")))
    cells
      .select(
        round(miTerm * 1e9).cast("long").as("mi_nano"),
        round(hxTerm * 1e9).cast("long").as("hx_nano"),
        round(hyTerm * 1e9).cast("long").as("hy_nano"))
      .agg(sum(col("mi_nano")).as("mi_n"), sum(col("hx_nano")).as("hx_n"),
        sum(col("hy_nano")).as("hy_n"))
      .select(
        round(col("mi_n") / 1e3).cast("long").as("mi_micro"),
        round(col("hx_n") / 1e3).cast("long").as("h_x_micro"),
        round(col("hy_n") / 1e3).cast("long").as("h_y_micro"),
        when(col("hx_n") > 0 && col("hy_n") > 0,
          round(col("mi_n") / sqrt(col("hx_n").cast("double") * col("hy_n")),
            6))
          .otherwise(lit(null).cast("double")).as("nmi"))
  }

  /** Categorical effect sizes: Cramér's V and both Theil uncertainty
    * coefficients — the MAGNITUDE companions of [[chiSquare]] (which
    * only answers "is there dependence?", inflating with n) on the
    * same (x, y) cell contraction. V = √(χ²/n/min(|X|−1, |Y|−1)) ∈
    * [0,1]; U(x|y) = MI/H(x) is the asymmetric "how much of x does y
    * explain?" (and U(y|x) = MI/H(y)) — the pair a dataset-design
    * audit wants when deciding whether `source` is a proxy for `lang`.
    *
    * Determinism: χ² via the empty-cell-folding closed form
    * χ² = n + Σ_observed[(o−e)²/e − e] and MI/H terms nano-quantized
    * per cell before summing (the [[chiSquare]]/[[mutualInfo]]
    * conventions verbatim — both statistics are sums over the SAME
    * cell frame, so one pass yields all of them).
    *
    * Scale: one (x, y) hash aggregate contracts the table map-side;
    * margins are window sums over the |X|·|Y|-cell contraction;
    * nothing downstream sees row counts. Output one row:
    * (n, n_cells, cramers_v, theils_u_xy, theils_u_yx). */
  def effectSizes(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val cells = joint
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    val dbl = (c: Column) => c.cast("double")
    val e = dbl(col("nx")) * dbl(col("ny")) / dbl(col("n"))
    val chiTerm = (dbl(col("nxy")) - e) * (dbl(col("nxy")) - e) / e - e
    val miTerm = dbl(col("nxy")) / dbl(col("n")) *
      log(dbl(col("nxy")) * dbl(col("n")) / (dbl(col("nx")) * dbl(col("ny"))))
    val hxTerm = dbl(col("nxy")) / dbl(col("n")) *
      -log(dbl(col("nx")) / dbl(col("n")))
    val hyTerm = dbl(col("nxy")) / dbl(col("n")) *
      -log(dbl(col("ny")) / dbl(col("n")))
    cells
      .select(col("n"),
        round(chiTerm * 1e9).cast("long").as("chi_nano"),
        round(miTerm * 1e9).cast("long").as("mi_nano"),
        round(hxTerm * 1e9).cast("long").as("hx_nano"),
        round(hyTerm * 1e9).cast("long").as("hy_nano"),
        col("x"), col("y"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        countDistinct(col("x")).as("kx"),
        countDistinct(col("y")).as("ky"),
        sum(col("chi_nano")).as("chi_n"), sum(col("mi_nano")).as("mi_n"),
        sum(col("hx_nano")).as("hx_n"), sum(col("hy_nano")).as("hy_n"))
      .select(col("n"), col("n_cells"), {
        val chi2 = col("n").cast("double") + col("chi_n") / 1e9
        val minDim = least(col("kx"), col("ky")).cast("double") - 1
        when(minDim > 0 && chi2 > 0,
          round(sqrt(chi2 / col("n") / minDim), 6))
          .otherwise(lit(null).cast("double")).as("cramers_v")
      },
        when(col("hx_n") > 0,
          round(col("mi_n").cast("double") / col("hx_n"), 6))
          .otherwise(lit(null).cast("double")).as("theils_u_xy"),
        when(col("hy_n") > 0,
          round(col("mi_n").cast("double") / col("hy_n"), 6))
          .otherwise(lit(null).cast("double")).as("theils_u_yx"))
  }

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val pieces = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n"),
        col(s"${c}__null").as("n_null"),
        col(s"${c}__dist").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__mean").as("mean_value"))
    }
    one.select(explode(array(pieces: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }

  /** Calibration table + expected calibration error (ECE, Guo et al.
    * ICML'17) for a [0,1]-micro confidence score against a binary
    * outcome — the gate a pipeline runs before trusting a cheap
    * quality score as a proxy for an expensive keep/drop decision
    * (well-calibrated score ⇒ threshold the score and skip the
    * funnel; miscalibrated ⇒ the score's ordering may still rank but
    * its VALUES lie). Bins are EQUAL-WIDTH on the confidence axis
    * (the standard ECE binning — and, unlike ntile, a pure map-side
    * expression: no global sort, no unpartitioned window funnel).
    * Per bin: n, mean confidence, empirical accuracy, |gap|; the
    * one-number summary ECE = Σ nᵇ·|gapᵇ| / N rides on every row.
    *
    * Determinism: confidence arrives as integer micros; per-bin sums
    * are integer; means are floor divisions of two integers. Empty
    * bins are absent (their ECE contribution is zero by definition).
    *
    * Scale: one groupBy(bin) contraction (≤ nBins groups, map-side
    * partials), then arithmetic on the ≤ nBins frame with a 1-row
    * broadcast total. Emits (bin, n, conf_mean_micro, acc_micro,
    * gap_micro, ece_micro) ordered by bin. */
  def calibrationStats(scored: DataFrame, confMicro: Column,
                       label: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val base = scored.select(confMicro.cast("long").as("conf_micro"),
        label.cast("long").as("lbl"))
      // conf = exactly 1.0 (1e6 micros) belongs to the TOP bin, not a
      // one-past-the-end bin of its own
      .withColumn("bin",
        least(expr(s"conf_micro * $nBins div 1000000"),
          lit(nBins - 1L)))
    val perBin = base.groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(col("conf_micro")).as("_sc"),
        sum(col("lbl")).as("_sl"))
      .select(col("bin"), col("n"),
        expr("_sc div n").as("conf_mean_micro"),
        expr("_sl * 1000000 div n").as("acc_micro"))
      .withColumn("gap_micro",
        abs(col("conf_mean_micro") - col("acc_micro")))
    val ece = perBin.agg(
      expr("sum(n * gap_micro) div sum(n)").as("ece_micro"))
    perBin.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("conf_mean_micro"),
        col("acc_micro"), col("gap_micro"), col("ece_micro"))
      .orderBy(col("bin"))
  }

  /** Referential-integrity audit between two keyed tables — the FK
    * health gate a multi-table pipeline runs before any join-dependent
    * stage (documents ↔ embeddings, orders ↔ lineitem, docs ↔ scores):
    * silent orphans on either side turn inner joins into silent row
    * loss and left joins into null floods. Counts DISTINCT keys (dup
    * keys are a different gate), matched and orphaned on each side,
    * and two-way coverage in exact micros. One row: (n_left_keys,
    * n_right_keys, n_matched, n_left_orphan, n_right_orphan,
    * left_coverage_micro, right_coverage_micro).
    *
    * Scale: two distinct contractions keyed on the id, one full-outer
    * equi-join of the KEY SETS (never the payloads), one count row. */
  def refIntegrityStats(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String): DataFrame = {
    val lk = left.select(col(leftKey).as("lk")).distinct()
    val rk = right.select(col(rightKey).as("rk")).distinct()
    lk.join(rk, col("lk") === col("rk"), "full_outer")
      .agg(
        sum(col("lk").isNotNull.cast("long")).as("n_left_keys"),
        sum(col("rk").isNotNull.cast("long")).as("n_right_keys"),
        sum((col("lk").isNotNull && col("rk").isNotNull).cast("long"))
          .as("n_matched"))
      .select(col("n_left_keys"), col("n_right_keys"), col("n_matched"),
        (col("n_left_keys") - col("n_matched")).as("n_left_orphan"),
        (col("n_right_keys") - col("n_matched")).as("n_right_orphan"),
        expr("n_matched * 1000000 div greatest(n_left_keys, 1)")
          .as("left_coverage_micro"),
        expr("n_matched * 1000000 div greatest(n_right_keys, 1)")
          .as("right_coverage_micro"))
  }

  /** Per-group value-mix entropy — the data-card composition row
    * (language mix per source, source mix per shard, label mix per
    * cell): for each group, the Shannon entropy of its value
    * distribution plus the dominant value and its share. Entropy 0 =
    * monoculture; ln(|values|) = uniform mix. The [[mutualInfo]]
    * machinery restricted to one margin, emitted per group instead of
    * globally.
    *
    * Determinism: counts are exact; each cell's −p·ln p term is
    * nano-quantized to BIGINT before the per-group sum (order-free
    * shuffles, the [[mutualInfo]]/[[chiSquare]] convention); the
    * dominant value ties to the smallest value string.
    *
    * Scale: one (group, value) count contraction, keyed windows over
    * the ≤|groups|·|values| cell frame — shuffle cost is cells, not
    * rows. */
  def groupEntropyStats(df: DataFrame, groupCol: String,
                        valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("nxv"))
      .withColumn("ng",
        sum(col("nxv")).over(Window.partitionBy(col(groupCol))))
    val p = col("nxv").cast("double") / col("ng").cast("double")
    val termNano = round(-p * log(p) * 1e9).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("nxv").desc, col(valCol))
    cells
      .withColumn("_t", termNano)
      .withColumn("_rk", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(min(col("ng")).as("n_rows"),
        count(lit(1)).as("n_values"),
        round(sum(col("_t")) / 1e3).cast("long").as("entropy_micro"),
        max(when(col("_rk") === 1, col(valCol))).as("top_value"),
        max(when(col("_rk") === 1,
          expr("nxv * 1000000 div ng"))).as("top_share_micro"))
      .orderBy(col(groupCol))
  }

  /** Watermark-delay advisor from measured event-time disorder — the
    * batch audit that tunes a streaming job's `withWatermark` before
    * it ships: within each key's stream (arrival order proxied by
    * `arrivalCol` — a monotone ingest id; the standing fixture
    * assumption, documented at the call site), an event's LATENESS is
    * how far the key's running-max event time has already passed it.
    * Lateness is bucketed by decimal digit count (the q264 exact
    * integer bucketing — no float log), cumulative coverage is exact
    * integer micros, and `advised` marks the first bucket whose
    * coverage clears `coverMicro`: a watermark of that bucket's
    * `max_late_s` would have admitted that share of these events.
    *
    * Emits (bucket, n_events, max_late_s, cum_micro, advised),
    * ordered by bucket; bucket 0 = in-order events.
    *
    * Scale: one key-partitioned running-max window (keyed, never
    * global), one ≤12-group aggregate, then window math on the
    * contracted histogram. */
  def watermarkAdvisor(events: DataFrame, coverMicro: Long = 990000L,
                       keyCol: String = "user_id",
                       arrivalCol: String = "event_id",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(coverMicro >= 1L && coverMicro <= 1000000L,
      "coverMicro is a micro share in [1, 1e6] (0 would make no bucket " +
        "advisable: the first bucket's prior coverage is already 0)")
    val ep = unix_timestamp(col(tsCol)).cast("long")
    // tieCol makes the ROWS frame deterministic when the arrival key
    // ties (a derived/jittered arrival order is not unique per key)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(arrivalCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    digitBucketCoverage(
      events.select((max(ep).over(w) - ep).as("_v")),
      coverMicro, "max_late_s")
  }

  /** Session-timeout advisor from the measured inter-event gap
    * distribution — the data-driven way to pick the gap parameter a
    * sessionizer (q101's session_window, `Sessionize`) otherwise
    * hardcodes: per key, the gaps between consecutive events, digit-
    * bucketed and cumulated exactly like [[watermarkAdvisor]];
    * `advised` marks the first bucket covering `coverMicro` of gaps —
    * a timeout at that bucket's `max_gap_s` keeps that share of
    * consecutive-event pairs inside one session.
    *
    * Emits (bucket, n_events, max_gap_s, cum_micro, advised).
    *
    * Scale: one key-partitioned lag window, one ≤12-group aggregate,
    * window math on the contracted histogram. */
  def sessionGapAdvisor(events: DataFrame, coverMicro: Long = 990000L,
                        keyCol: String = "user_id",
                        tsCol: String = "ts",
                        tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(coverMicro >= 1L && coverMicro <= 1000000L,
      "coverMicro is a micro share in [1, 1e6] (0 would make no bucket " +
        "advisable: the first bucket's prior coverage is already 0)")
    val ep = unix_timestamp(col(tsCol)).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(ep, col(tieCol))
    digitBucketCoverage(
      events.select(ep.as("_ep"),
          lag(ep, 1).over(w).as("_prev"))
        .filter(col("_prev").isNotNull)
        .select((col("_ep") - col("_prev")).as("_v")),
      coverMicro, "max_gap_s")
  }

  /** Per-group Spearman agreement between two per-row signals — the
    * cheap-vs-expensive signal gate (composite quality vs unigram-LM
    * bits, heuristic vs learned score): high |ρ| per source says the
    * cheap signal can stand in for that source's ranking decisions,
    * ρ ≈ 0 says the two measure different things and the funnel needs
    * both. Ranks are row_number by (signal, id) — id tie-breaks are
    * part of the contract — and ρ uses the exact integer formula with
    * the [[graft.ext.Retrieval.spearmanStats]] signed-division
    * convention.
    *
    * LIMITATION: the exact integer n(n²−1)·10⁶ formula overflows past
    * ~10⁴ rows per group; larger groups emit a NULL ρ with the counts
    * intact (overflow loud, never silently wrapped — the r15 ADVICE
    * convention). Sample per group before calling at corpus scale.
    *
    * Emits (groupCol, n, sum_d2, rho_micro), ordered.
    *
    * Scale: two group-keyed rank windows, one group aggregate. */
  def signalAgreementStats(df: DataFrame, groupCol: String,
                           valA: Column, valB: Column,
                           idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
      valA.as("_a"), valB.as("_b"))
    val wa = Window.partitionBy(col("_g")).orderBy(col("_a"), col("_id"))
    val wb = Window.partitionBy(col("_g")).orderBy(col("_b"), col("_id"))
    base
      .withColumn("_ra", row_number().over(wa).cast("long"))
      .withColumn("_rb", row_number().over(wb).cast("long"))
      .groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("_ra") - col("_rb")) * (col("_ra") - col("_rb")))
          .as("sum_d2"))
      .select(col(groupCol), col("n"), col("sum_d2"),
        when(col("n") < 2L, lit(1000000L))
          .when(col("n") > 10000L, lit(null).cast("long"))
          .otherwise(
            expr("""CASE WHEN n * (n * n - 1) - 6 * sum_d2 >= 0
                   |THEN (n * (n * n - 1) - 6 * sum_d2) * 1000000
                   |     div (n * (n * n - 1))
                   |ELSE -((-(n * (n * n - 1) - 6 * sum_d2)) * 1000000
                   |     div (n * (n * n - 1)))
                   |END""".stripMargin))
          .as("rho_micro"))
      .orderBy(col(groupCol))
  }

  /** Shared tail of the delay advisors: digit-count buckets (the q264
    * exact integer bucketing — no float log) over a non-negative `_v`
    * column, exact integer cumulative coverage, and the advised-bucket
    * flag (first bucket whose coverage clears `coverMicro`). */
  private def digitBucketCoverage(vals: DataFrame, coverMicro: Long,
                                  maxName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = vals
      .withColumn("bucket",
        when(col("_v") === 0L, 0L)
          .otherwise(length(col("_v").cast("string")).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("_v")).as(maxName))
    val cumW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(lit(1))
    hist
      .withColumn("_cum_n", sum(col("n_events")).over(cumW))
      .withColumn("_tot", sum(col("n_events")).over(totW))
      .withColumn("cum_micro", expr("_cum_n * 1000000 div greatest(_tot, 1)"))
      .withColumn("_prev_micro",
        expr("(_cum_n - n_events) * 1000000 div greatest(_tot, 1)"))
      .select(col("bucket"), col("n_events"), col(maxName),
        col("cum_micro"),
        (col("cum_micro") >= coverMicro &&
          col("_prev_micro") < coverMicro).cast("long").as("advised"))
      .orderBy(col("bucket"))
  }
}
