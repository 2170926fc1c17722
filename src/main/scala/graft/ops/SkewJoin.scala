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
}
