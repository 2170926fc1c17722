package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of `array<double>` vectors as a typed
  * `Aggregator`: each partition folds its vectors into ONE
  * (sum-vector, count) buffer, so the shuffle carries one buffer per
  * group per partition — the aggregation analogue of a partial
  * sum. The built-in alternative (posexplode to (group, dim, value)
  * and groupBy-avg per dim) shuffles n_vectors × dims rows, which at
  * corpus scale (10⁹ × 1024) is three orders of magnitude more wire
  * traffic than the partial buffers.
  *
  * This is the one aggregation in the library that a native Catalyst
  * `Expression` cannot express (custom aggregation state needs the
  * Aggregator/TypedImperativeAggregate surface, not a scalar
  * expression), which is why the UDAF form is justified here — the
  * preference order scalar-Expression > UDF still holds everywhere
  * else.
  *
  * Empty input yields an empty vector (callers guard); vectors are
  * assumed same-length within a group, extra trailing dimensions of
  * longer vectors are ignored once the buffer width is fixed.
  */
object VectorMean
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long),
                      a: Array[Double]): (Array[Double], Long) =
    if (a == null) b
    else if (b._2 == 0L) (a.clone(), 1L)
    else {
      val s = b._1
      val n = math.min(s.length, a.length)
      var i = 0
      while (i < n) { s(i) += a(i); i += 1 }
      (s, b._2 + 1)
    }

  override def merge(x: (Array[Double], Long),
                     y: (Array[Double], Long)): (Array[Double], Long) =
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      val n = math.min(s.length, y._1.length)
      var i = 0
      while (i < n) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray
    else {
      val out = new Array[Double](r._1.length)
      var i = 0
      while (i < out.length) { out(i) = r._1(i) / r._2; i += 1 }
      out
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

/** Reduce-order-FREE element-wise mean of `array<double>` vectors on
  * the library's 6-dp grid — the determinism-hardened sibling of
  * [[VectorMean]] for TRAINED-MODEL values (k-means centroids, PQ
  * codebooks, residual recenter means, label centroids).
  *
  * [[VectorMean]] sums IEEE doubles in task-completion order, so a
  * mean sitting within an ulp of a 6-dp rounding boundary can flip
  * between runs (round-12 postmortem: the PQ drift gates q199/q204/
  * q214 sum micro² error over every element of every vector, so ONE
  * flipped centroid element reds the hash). This aggregator removes
  * the float summation entirely: each input element is pinned to an
  * integer micro (`floor(x·1e6 + 0.5)` — the [[graft.ext.Similarity]]
  * LUT convention) BEFORE aggregation, micros accumulate in exact
  * Long addition (associative + commutative ⇒ order-free), and the
  * mean micro is `floor(sum/count + 0.5)` — one IEEE division of two
  * integers both engines reproduce bit-identically. The emitted
  * double is `meanMicro / 1e6`, exactly the value
  * `round(x, 6)`-style oracles can replay as
  * `CAST(floor(CAST(sum(CAST(floor(x*1e6+0.5) AS BIGINT)) AS DOUBLE)
  *  / count(*) + 0.5) AS BIGINT) / 1e6`.
  *
  * Overflow posture: |element| up to ~9·10⁶ micros (embeddings are
  * O(1)) leaves the Long sum headroom for ~10¹² members per group —
  * beyond any per-cluster population this library targets; the
  * decimal(38,0) escalation the audit sums use is not needed here.
  * Empty input yields an empty vector (callers guard); same
  * trailing-dimension truncation as [[VectorMean]].
  */
object VectorMicroMean
    extends Aggregator[Array[Double], (Array[Long], Long), Array[Double]] {

  @inline private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  override def reduce(b: (Array[Long], Long),
                      a: Array[Double]): (Array[Long], Long) =
    if (a == null) b
    else if (b._2 == 0L) {
      val s = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { s(i) = micro(a(i)); i += 1 }
      (s, 1L)
    } else {
      val s = b._1
      val n = math.min(s.length, a.length)
      var i = 0
      while (i < n) { s(i) += micro(a(i)); i += 1 }
      (s, b._2 + 1)
    }

  override def merge(x: (Array[Long], Long),
                     y: (Array[Long], Long)): (Array[Long], Long) =
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      val n = math.min(s.length, y._1.length)
      var i = 0
      while (i < n) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }

  override def finish(r: (Array[Long], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray
    else {
      val out = new Array[Double](r._1.length)
      var i = 0
      while (i < out.length) {
        out(i) = math.floor(r._1(i).toDouble / r._2 + 0.5) / 1e6
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object VectorAggregates {
  /** Column-API form of [[VectorMean]] for untyped aggregation:
    * `df.groupBy(...).agg(vector_mean(col("v")))`. */
  val vector_mean: UserDefinedFunction =
    udaf(VectorMean, ExpressionEncoder[Array[Double]]())

  /** Column-API form of [[VectorMicroMean]] — use this (NOT
    * `vector_mean` + `round(_, 6)`) whenever the mean becomes a
    * trained-model value an oracle replays: the output is already on
    * the 6-dp grid and bit-stable across parallelism/reduce order. */
  val vector_micro_mean: UserDefinedFunction =
    udaf(VectorMicroMean, ExpressionEncoder[Array[Double]]())
}
