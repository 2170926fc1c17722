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
