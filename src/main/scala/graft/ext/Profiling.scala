package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the first step of any training-data
  * intake: per-column row/null/distinct counts and numeric min/max/mean.
  * One pass over the data (a single aggregate computes every column's
  * stats; the per-column rows are unpivoted from that one result), so
  * profiling a 100 TB table costs one scan, not one scan per column.
  */
object Profiling {

  /** Profile `cols` (numeric columns) of `df`: one output row per
    * column with n, n_null, n_distinct (exact), min/max/mean rounded
    * to 4 via floor-truncation (cross-engine stable for oracle use). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = statAggs(cols, countDistinct(_))
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
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
    val aggs = statAggs(cols, c => approx_count_distinct(c, rsd))
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The shared six-stat aggregate list; only the distinct-count
    * strategy differs between the exact and approximate profiles. */
  private def statAggs(cols: Seq[String],
                       distinctAgg: Column => Column): Seq[Column] = {
    val t4 = TextAnalysis.trunc4 _
    cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__null"),
        distinctAgg(col(c)).as(s"${c}__dist"),
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
    * window/aggregate sums, one double division at the end.
    *
    * Scale: the only full-data pass is the per-key count (map-side
    * partial). The ranking window runs on the key-cardinality
    * contraction; if even THAT is huge, the window partitions by
    * nothing — so this diagnostic is for key spaces that fit a single
    * partition after contraction (10⁷ keys ≈ 160 MB — fine); beyond
    * that, sample keys first. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    // ascending count, key tie-break: deterministic ranks
    val w = Window.orderBy(col("cnt"), col("k"))
    val wDesc = Window.orderBy(col("cnt").desc, col("k"))
    counts
      .withColumn("i", row_number().over(w))
      .withColumn("rk_desc", row_number().over(wDesc))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        sum(col("i") * col("cnt")).as("iwsum"),
        sum(when(col("rk_desc") === 1, col("cnt")).otherwise(0L))
          .as("top1"),
        sum(when(col("rk_desc") <= topK, col("cnt")).otherwise(0L))
          .as("topk"))
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
}
