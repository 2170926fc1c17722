package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — match each left row with the latest right row whose
  * timestamp is ≤ the left row's (per key). Spark has no native ASOF
  * operator; rather than a custom physical node, this uses the scalable
  * union + window idiom:
  *
  *   tag both sides → union → one shuffle on the key → per-key
  *   time-ordered `last(right_payload, ignoreNulls)` running window →
  *   keep left rows.
  *
  * One exchange total (same as any keyed join), no range-condition
  * explosion, arbitrary skew handled by AQE — the plan shape that
  * survives a 100 TB fact side. Inner semantics: left rows with no
  * prior right row are dropped (matching SQL ASOF JOIN).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (exposed as
    *                `asof_<name>`, plus `asof_ts` for the matched time).
    *  Right rows must be unique per (key, ts) for deterministic output. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val r = right.select(
        col(keyCol).as("_k"), col(tsCol).as("_ts"),
        struct(
          col(tsCol).as("asof_ts") +:
            payload.map(c => col(c).as(s"asof_$c")): _*).as("_r"))
      .withColumn("_side", lit(0))
    val l = left
      .withColumn("_k", col(keyCol))
      .withColumn("_ts", col(tsCol))
      .withColumn("_side", lit(1))
    // left rows lack _r, right rows lack the left columns — unionByName
    // fills both with nulls and keeps the struct type from the right.
    val u = l.unionByName(r, allowMissingColumns = true)
    // right sorts before left at equal timestamps, so ts-equal matches
    // are inclusive (ASOF ... ON l.ts >= r.ts).
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_m").isNotNull)
      .select(leftCols.map(col) ++
        ("asof_ts" +: payload.map(c => s"asof_$c")).map(f => col(s"_m.$f")): _*)
  }
}
