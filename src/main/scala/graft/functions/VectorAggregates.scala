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

object VectorAggregates {
  /** Column-API form of [[VectorMean]] for untyped aggregation:
    * `df.groupBy(...).agg(vector_mean(col("v")))`. */
  val vector_mean: UserDefinedFunction =
    udaf(VectorMean, ExpressionEncoder[Array[Double]]())
}
