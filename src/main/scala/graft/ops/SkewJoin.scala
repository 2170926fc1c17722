package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for the 100 TB tier. AQE's skew-join split
  * handles most sort-merge skew at runtime; explicit salting is still
  * the tool of choice when one join key dominates so heavily that a
  * single post-split partition is still too large, or when AQE is off
  * (e.g. inside some streaming micro-batches).
  *
  * `saltedEquiJoin` spreads each big-side row across `salt` sub-keys
  * and replicates the small side `salt` times, so one hot key lands on
  * `salt` different reducers instead of one. Row-for-row equivalent to
  * the plain equi-join (verified by test).
  */
object SkewJoin {

  /** Inner equi-join of a skewed `big` side with a smaller `dim` side on
    * big(bigKey) == dim(dimKey), salted `salt` ways. Column sets must be
    * disjoint (as after the usual select-projection discipline). */
  def saltedEquiJoin(big: DataFrame, dim: DataFrame,
                     bigKey: String, dimKey: String,
                     salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    // big side: deterministic pseudo-random salt per row — derived from
    // the whole row's hash, not rand(), so retries/speculative tasks
    // produce identical output.
    val salted = big.withColumn("_salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    // dim side: replicate once per salt value.
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          col(bigKey) === col(dimKey))
      .drop("_salt")
  }

  /** Two-stage (partial → final) salted sum: stage 1 aggregates on
    * (group, salt) so a hot group spreads over `salt` reducers, stage 2
    * folds the partials. The salt comes from a per-row id, NOT the
    * value column — a hot group whose value is constant (the common
    * skew shape) would map every row to one salt and spread nothing,
    * and even a whole-row hash collapses when the hot rows are exact
    * duplicates. Sum is commutative/associative, so the result is
    * identical under ANY row→salt assignment (retries included).
    * Sum-only: extend by decomposing (count → sum of partial counts,
    * avg → sum/count pair) — non-decomposable aggregates (exact
    * countDistinct) need a different strategy (two-level
    * distinct-then-count). */
  def saltedGroupSum(df: DataFrame, groupCol: String, valueCol: String,
                     salt: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salt)))
      .groupBy(col(groupCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(groupCol))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** Hot-key pre-split for the ORDERED window case — the general form
    * of the "pre-split pathological hot groups" escape hatch the keyed
    * cumulative windows (SCD2-style histories, weighted medians,
    * first-occurrence elections) document by hand.
    *
    * A plain `sum OVER (PARTITION BY g ORDER BY o)` funnels each
    * group's full row set through ONE task; when one group dominates
    * the table, that task is the job. This is the classic two-phase
    * parallel scan instead: (1) split each group's ORDER RANGE into
    * `salt` equal-width segments (bounds from a per-group min/max hash
    * aggregate joined back — deterministic, no rand()), run the cumsum
    * per (group, segment) so a hot group occupies `salt` tasks; (2)
    * per-segment totals (≤ `salt` rows per group) get an exclusive
    * running sum over the segment index — a provable contraction, so
    * the tiny second window is gate-legal — and join back as offsets:
    * final cumsum = local cumsum + offset of all earlier segments.
    *
    * Inclusive RANGE-frame semantics (ties take their tie-group-end
    * total, exactly DuckDB's `RANGE BETWEEN UNBOUNDED PRECEDING AND
    * CURRENT ROW`): tie rows never straddle a segment boundary (equal
    * order values hash to the same segment by construction), so the
    * result is deterministic and row-for-row equal to the direct
    * window at ANY salt (verified by test). Requires a NUMERIC
    * `orderCol` (epoch seconds, ids, cents); the equal-width split
    * assumes the order values are not pathologically clustered —
    * timestamps and sequence ids, the common hot-group shapes, split
    * evenly. Appends `outCol`; `_lo/_hi/_seg` scratch columns are
    * dropped.
    *
    * `totCol` (optional) additionally appends the GROUP TOTAL of
    * `valueCol` to every row — for free: the per-segment totals the
    * offsets pass already aggregates sum to exactly the group total,
    * so a second tiny window over the ≤-salt-rows-per-group offsets
    * frame replaces what would otherwise be a separate whole-input
    * aggregate plus a join (the median family needs cum AND total;
    * computing the total separately cost the salted path an extra
    * input scan + broadcast join per call). */
  def saltedCumSum(df: DataFrame, groupCol: String, orderCol: String,
                   valueCol: String, salt: Int = 16,
                   outCol: String = "cum",
                   totCol: Option[String] = None): DataFrame = {
    require(salt > 0, "salt must be positive")
    import org.apache.spark.sql.expressions.Window
    val bounds = df.groupBy(col(groupCol))
      .agg(min(col(orderCol)).as("_lo"), max(col(orderCol)).as("_hi"))
    // (o - lo) * salt div (hi - lo + 1) ∈ [0, salt) — integer math, no
    // boundary epsilon; a constant-order group collapses to segment 0
    val seg = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(expr(s"(($orderCol - _lo) * $salt) div (_hi - _lo + 1)"))
    val wLocal = Window.partitionBy(col(groupCol), col("_seg"))
      .orderBy(col(orderCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.join(bounds, groupCol)
      .withColumn("_seg", seg)
      .withColumn("_local", sum(col(valueCol)).over(wLocal))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val segTotals = local.groupBy(col(groupCol), col("_seg"))
      .agg(sum(col(valueCol)).as("_segtot"))
      .withColumn("_off", coalesce(sum(col("_segtot")).over(wOff), lit(0L)))
    val offsets = totCol match {
      case None => segTotals.select(col(groupCol), col("_seg"), col("_off"))
      case Some(t) => segTotals
        .withColumn(t, sum(col("_segtot"))
          .over(Window.partitionBy(col(groupCol))))
        .select(col(groupCol), col("_seg"), col("_off"), col(t))
    }
    local.join(offsets, Seq(groupCol, "_seg"))
      .withColumn(outCol, col("_local") + col("_off"))
      .drop("_lo", "_hi", "_seg", "_local", "_off")
  }
}
