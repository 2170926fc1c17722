package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitter summary as a typed `Aggregator`: a
  * capacity-bounded frequency map per group, mergeable across
  * partitions.
  *
  * Why this exists: an exact `groupBy(key).count` over an UNBOUNDED key
  * domain (URLs, n-grams, user agents) shuffles one row per distinct
  * key — at corpus scale that is the dominant cost and, on skewed
  * domains, a straggler factory. The MG summary instead carries at most
  * `capacity` counters per group per partition through the shuffle, and
  * guarantees that every key with true frequency > N/capacity survives
  * into the final summary (N = group row count). The standard use is
  * two-pass exact heavy hitters: MG pass → candidate set (bounded) →
  * exact recount restricted to the candidates — see
  * `TextAnalysis.heavyGrams`, which guarantees an exact top-k whenever
  * the k-th frequency clears the N/capacity floor.
  *
  * Semantics (Misra-Gries '82):
  *  - increment on hit;
  *  - insert at 1 when below capacity;
  *  - otherwise decrement EVERY counter by 1 and drop zeros (each such
  *    step retires capacity+1 occurrences, which is what bounds the
  *    undercount by N/capacity).
  * Merge adds counters pointwise, then if over capacity subtracts the
  * (capacity+1)-th largest count from all and drops non-positives — the
  * Agarwal et al. mergeable-summaries rule, preserving the same error
  * bound. Reported counts are therefore LOWER bounds; the recount pass
  * restores exact values for the survivors.
  *
  * State is an immutable Map (Spark's encoder surface); a production
  * single-JVM hot loop would use an open-addressed table, but the
  * buffer is already bounded at `capacity` entries so per-row cost is
  * O(1) amortized and the decrement sweep O(capacity) only on eviction.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    if (key == null) b
    else b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.values.toArray.sortBy(-_).apply(capacity)
      sum.flatMap { case (k, c) =>
        if (c - cut > 0) Some(k -> (c - cut)) else None
      }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Size-capped long collector: gathers a group's values into a sorted
  * array, but STOPS accumulating one element past `cap` and finishes
  * as SQL NULL for any group that exceeded it — the bounded-memory
  * building block for inverted-index posting lists with a hot-key
  * guard. The built-in alternative (collect_list then filter on
  * size()) first materializes the hottest key's FULL list (a
  * corpus-universal boilerplate shingle shared by 10⁸ docs = a
  * multi-GB aggregation row) before dropping it; this buffer is
  * ≤ cap+1 longs per group by construction, map-side partials
  * included, and overloaded groups cost O(cap) memory and then absorb
  * further input for free. A count-aggregate + anti-join guard gets
  * the same bound but spends an extra corpus shuffle and a
  * materialization of the shingle rows for the two consumers. */
class CappedCollect(cap: Int)
    extends Aggregator[Long, (Array[Long], Int), Array[Long]] {
  // cap+1 must not overflow Int: with cap = Int.MaxValue the overflow
  // marker would wrap to Int.MinValue and EVERY group would finish
  // NULL with no error. "No cap" callers use plain collect_list.
  require(cap > 0 && cap < Int.MaxValue,
    "cap must be positive and below Int.MaxValue (use collect_list for uncapped)")
  private val stop = cap + 1 // reaching one past the cap marks overflow

  override def zero: (Array[Long], Int) = (Array.emptyLongArray, 0)

  // NOTE: the Long input encoder is primitive (non-nullable) — a null
  // input row fails at deserialization before reduce can guard it;
  // callers filter nulls first (collect_list parity: nulls skipped).
  override def reduce(b: (Array[Long], Int), a: Long): (Array[Long], Int) =
    if (b._2 >= stop) b
    else {
      val arr =
        if (b._1.length == 0) new Array[Long](math.min(stop, 16))
        else if (b._2 == b._1.length)
          java.util.Arrays.copyOf(b._1,
            math.min(stop.toLong, b._1.length * 2L).toInt)
        else b._1
      arr(b._2) = a
      (arr, b._2 + 1)
    }

  override def merge(x: (Array[Long], Int),
                     y: (Array[Long], Int)): (Array[Long], Int) =
    if (x._2 >= stop || y._2 == 0) x
    else if (x._2 == 0) y
    else {
      val n = math.min(stop, x._2 + y._2)
      val out = java.util.Arrays.copyOf(x._1, n)
      var i = x._2
      var j = 0
      while (i < n) { out(i) = y._1(j); i += 1; j += 1 }
      (out, n)
    }

  override def finish(r: (Array[Long], Int)): Array[Long] =
    if (r._2 >= stop) null
    else {
      val out = java.util.Arrays.copyOf(r._1, r._2)
      java.util.Arrays.sort(out) // deterministic despite merge order
      out
    }

  override def bufferEncoder: Encoder[(Array[Long], Int)] =
    ExpressionEncoder[(Array[Long], Int)]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object SketchAggregates {
  /** Column-API form: `df.groupBy(g).agg(mg_summary(64)(col("key")))`
    * yields a `map<string,bigint>` of ≤ capacity lower-bound counts. */
  def mg_summary(capacity: Int): UserDefinedFunction =
    udaf(new MisraGries(capacity), ExpressionEncoder[String]())

  /** Column-API form: sorted `array<bigint>` of the group's values, or
    * NULL for groups larger than `cap` (filter with isNotNull). */
  def capped_collect(cap: Int): UserDefinedFunction =
    udaf(new CappedCollect(cap), ExpressionEncoder[Long]())
}
