package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, SubqueryBridge}

/** Explicit bloom-filter runtime pruning — the shuffle-volume lever for
  * fact-to-dim joins where the dim side is TOO BIG TO BROADCAST but its
  * key set still fits a few-megabyte bloom. Spark's own
  * InjectRuntimeFilter does this automatically only when its
  * heuristics fire (creation-side size/row thresholds, selective
  * filter detection); this operator is the deterministic, always-on
  * form for the pipelines that know their shape.
  *
  * Plan shape (identical to InjectRuntimeFilter's rewrite):
  * the build side aggregates `bloom_filter_agg(xxhash64(key))` to ONE
  * row, attached to the probe side as a scalar subquery inside a
  * `might_contain` filter — a codegen'd predicate evaluated before the
  * probe side ever reaches the join exchange. At 100 TB the win is the
  * shuffle: only fact rows whose key *might* match ship; everything
  * else dies at the scan. No false negatives (bloom guarantee), and
  * false positives are removed by the exact join that follows, so the
  * result is row-identical to the plain inner join (spec-verified).
  */
object RuntimeFilters {

  /** One-row frame holding a bloom of `xxhash64(key)` over `build`.
    * Sizing: `numBits / expectedItems` ≈ bits-per-key (the 1M/8.4M
    * default ≈ 8.4 bits/key ≈ 3% fpp — Spark's own runtime-filter
    * default). At 10⁹ dim keys set expectedItems accordingly: 8
    * bits/key is a gigabyte-scale fact's few-hundred-MB shuffle saved
    * for a 1 GB bloom — past that, fall back to a semi-join. */
  def keyBloom(build: DataFrame, key: String,
               expectedItems: Long = 1000000L,
               numBits: Long = 8388608L): DataFrame =
    build.select(
      ColumnBridge.column(new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(col(key))),
          Literal(expectedItems), Literal(numBits))
        .toAggregateExpression()).as("key_bloom"))

  /** `fact` rows whose `factKey` might be in `bloom` (a [[keyBloom]]
    * frame, attached as a scalar subquery). Keeps every true match;
    * may keep bloom false positives — compose with an exact join or
    * accept the fpp when used as a standalone pre-screen. */
  def prunedByBloom(fact: DataFrame, bloom: DataFrame,
                    factKey: String): DataFrame =
    fact.where(ColumnBridge.column(new BloomFilterMightContain(
      SubqueryBridge.scalarExpr(bloom),
      ColumnBridge.expression(xxhash64(col(factKey))))))

  /** Inner equi-join of `fact` with `dim`, with the fact side
    * bloom-pruned on the dim's key set before the join shuffle.
    * Row-identical to `fact.join(dim, factKey === dimKey)`; column
    * sets must be disjoint (the usual select-projection discipline). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8388608L): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedItems, numBits)
    prunedByBloom(fact, bloom, factKey)
      .join(dim, col(factKey) === col(dimKey))
  }

  /** The bloom `might_contain` predicate as a reusable Column (e.g. to
    * pre-screen several fact tables against one dim key set). */
  def mightContainKey(bloom: DataFrame, key: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      SubqueryBridge.scalarExpr(bloom),
      ColumnBridge.expression(xxhash64(key))))
}
