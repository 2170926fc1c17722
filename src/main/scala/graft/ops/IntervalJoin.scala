package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless interval join at scale: match point events to time intervals
  * [start, end) they fall into. The naive plan for this non-equi
  * condition is a broadcast-nested-loop (or worse, cartesian) join —
  * O(facts × intervals) comparisons, the classic scale-killer once the
  * interval table outgrows a broadcast.
  *
  * This implementation manufactures an equi-join key: time is cut into
  * fixed `bucketSec` buckets, every interval EXPLODES to the buckets it
  * covers (bounded by interval_length / bucketSec + 1 rows — callers
  * size the bucket to their typical interval so the blowup is a small
  * constant), every fact maps to exactly ONE bucket, and the join runs
  * as a hash shuffle on the bucket key with the precise [start, end)
  * containment as a post-join filter. A fact matches a covering
  * interval exactly once (one bucket per fact, one row per
  * (interval, bucket)), so no dedup pass is needed.
  */
object IntervalJoin {

  /** Join facts (epoch-second `tsCol`) to intervals ([`startCol`,
    * `endCol`) epoch seconds, end exclusive). All fact and interval
    * columns survive the join. Degenerate intervals (end ≤ start)
    * match nothing. */
  def intervalJoin(facts: DataFrame, intervals: DataFrame,
                   tsCol: String, startCol: String, endCol: String,
                   bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0)
    val fb = facts.withColumn("_b",
      floor(col(tsCol) / bucketSec).cast("long"))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(
        floor(col(startCol) / bucketSec).cast("long"),
        floor((col(endCol) - 1) / bucketSec).cast("long"))))
    fb.join(ib, Seq("_b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_b")
  }
}
