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

object SketchAggregates {
  /** Column-API form: `df.groupBy(g).agg(mg_summary(64)(col("key")))`
    * yields a `map<string,bigint>` of ≤ capacity lower-bound counts. */
  def mg_summary(capacity: Int): UserDefinedFunction =
    udaf(new MisraGries(capacity), ExpressionEncoder[String]())
}
