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
    * Sizing is EXPLICIT — no default: a fixed default silently
    * saturates (fpp → 1) the moment the build side outgrows it, which
    * is the one failure mode of this whole family. Callers without
    * exact stats size via [[adaptiveBloomSizing]] (what
    * [[bloomPrunedJoin]] does); `numBits / expectedItems` ≈
    * bits-per-key (8 ≈ 3% fpp — Spark's own runtime-filter default).
    * At 10⁹ dim keys 8 bits/key is a gigabyte-scale fact's
    * few-hundred-MB shuffle saved for a 1 GB bloom — past that, fall
    * back to a semi-join. */
  def keyBloom(build: DataFrame, key: String,
               expectedItems: Long,
               numBits: Long): DataFrame =
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
    * bloom-pruned on the dim's key set before the join shuffle —
    * bloom sized from the dim side via [[adaptiveBloomSizing]], so the
    * DEFAULT-named entry point is the always-safe one (the former
    * fixed 1M/8.4M-bit default silently saturated past ~10⁶ keys;
    * callers with exact stats use [[bloomPrunedJoinSized]] and skip
    * the sizing count). Row-identical to
    * `fact.join(dim, factKey === dimKey)`; column sets must be
    * disjoint (the usual select-projection discipline). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      bitsPerKey: Int = 8,
                      maxBits: Long = 67108864L): DataFrame = {
    val (n, bits) = adaptiveBloomSizing(dim, dimKey, bitsPerKey, maxBits)
    bloomPrunedJoinSized(fact, dim, factKey, dimKey, n, bits)
  }

  /** [[bloomPrunedJoin]] with EXPLICIT bloom sizing — the form for
    * callers that already know the dim-side key cardinality (catalog
    * stats, a prior audit) and can skip the sizing count. No
    * defaults: see [[keyBloom]]. */
  def bloomPrunedJoinSized(fact: DataFrame, dim: DataFrame,
                           factKey: String, dimKey: String,
                           expectedItems: Long,
                           numBits: Long): DataFrame = {
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

  /** Bloom sizing derived from the BUILD side — the fix for the
    * fixed-default failure mode: a 10⁹-key dim at the 1M/8.4M-bit
    * default saturates the filter (fpp → 1) and the "pruned" join
    * silently degrades to a pass-through scan + full shuffle. ONE
    * exact distinct count over the build keys (a dim-sized aggregate —
    * the build side is the SMALL side by definition; same plan-time
    * eagerness class as the IVF centroid collect) sets
    * expectedItems = n and numBits = n × bitsPerKey, clamped to
    * [64, maxBits]. At the default 8 bits/key the fpp stays ≈3% at any
    * build cardinality until maxBits caps it — past maxBits/bitsPerKey
    * keys the filter degrades again, which is exactly what
    * [[observedFpp]]'s gate exists to turn red (fall back to a
    * semi-join there).
    *
    * `maxBits` defaults to Spark's own runtime-bloom ceiling
    * (spark.sql.optimizer.runtime.bloomFilter.maxNumBits = 2²⁶ =
    * 8 MB): BloomFilterAggregate REJECTS larger filters unless that
    * conf is raised, so a bigger default would throw at plan time. */
  def adaptiveBloomSizing(build: DataFrame, key: String,
                          bitsPerKey: Int = 8,
                          maxBits: Long = 67108864L): (Long, Long) = {
    require(bitsPerKey > 0, "bitsPerKey must be positive")
    val n = math.max(1L,
      build.select(col(key)).where(col(key).isNotNull).distinct().count())
    (n, math.min(maxBits, math.max(64L, n * bitsPerKey)))
  }

  /** [[bloomPrunedJoin]] composed with
    * [[SkewJoin.saltedEquiJoin]] — the salted-fact case: the bloom
    * predicate kills non-matching fact rows BEFORE the salted
    * exchange (a codegen'd filter at the scan, exactly as in
    * [[prunedByBloom]]), and the survivors — now dominated by the hot
    * matching keys that made salting necessary — spread over `salt`
    * sub-keys instead of funneling one reducer. Order matters: salt
    * first and the bloom filter would run after the ×salt dim
    * replication's join, shipping every non-matching fact row through
    * the exchange it exists to avoid. Row-identical to the plain
    * inner join (bloom: no false negatives, false positives die in
    * the exact join; salting: row-for-row equivalent — both
    * spec-verified). */
  def bloomPrunedSkewJoin(fact: DataFrame, dim: DataFrame,
                          factKey: String, dimKey: String,
                          salt: Int = 16, bitsPerKey: Int = 8,
                          maxBits: Long = 67108864L): DataFrame = {
    val (n, bits) = adaptiveBloomSizing(dim, dimKey, bitsPerKey, maxBits)
    SkewJoin.saltedEquiJoin(
      prunedByBloom(fact, keyBloom(dim, dimKey, n, bits), factKey),
      dim, factKey, dimKey, salt)
  }

  /** Measured bloom quality — the observability half of adaptive
    * sizing: builds the bloom over `dim` exactly as
    * [[bloomPrunedJoin]] would, evaluates it on every fact
    * row, and compares against EXACT membership (one left join on the
    * distinct dim keys), emitting one row:
    *
    *  - `n_fact` fact rows, `n_match` with a true dim match,
    *    `n_nonmatch` without one (all exact — oracle-computable);
    *  - `n_false_pass`: non-matching rows the bloom passed anyway;
    *  - `observed_fpp_micro` = n_false_pass·10⁶ / n_nonmatch;
    *  - `design_fpp_micro`: the standard (1 − e^(−kn/m))^k for the
    *    sizing actually used (k = Spark's optimalNumOfHashFunctions).
    *
    * A deployment gates on observed ≤ c × design (the q136
    * sketch-gate pattern): saturation — too many keys for the bits,
    * the silent-degradation mode — blows observed fpp far past design
    * and turns the gate red instead of quietly shipping a useless
    * filter. Cost: one pass over fact + the dim-key contraction join —
    * this is a MEASUREMENT op, run on a sample or sidecar, not spliced
    * into the hot join; at 100 TB set `factSampleMod` for a
    * deterministic ~1/mod fact-side hash sample (the fpp RATE is
    * estimated unbiasedly; counts become sample counts). */
  def observedFpp(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  bitsPerKey: Int = 8,
                  maxBits: Long = 67108864L,
                  factSampleMod: Long = 1L): DataFrame = {
    require(factSampleMod >= 1L, "factSampleMod must be >= 1")
    val (n, m) = adaptiveBloomSizing(dim, dimKey, bitsPerKey, maxBits)
    // Spark's BloomFilterImpl: k = max(1, round(m/n · ln 2))
    val k = math.max(1L, math.round(m.toDouble / n * math.log(2.0)))
    val designFppMicro = math.round(1e6 *
      math.pow(1.0 - math.exp(-k.toDouble * n / m), k.toDouble))
    val bloom = keyBloom(dim, dimKey, n, m)
    val dimKeys = dim.select(col(dimKey).as("_dk")).distinct()
    // the 100 TB sidecar mode: a deterministic ~1/mod hash-keep of the
    // fact side (xxhash64 of the key with a salt uncorrelated to the
    // bloom's own xxhash64(key) hash — sampling on the raw key hash
    // would bias the sample toward one region of the bloom's domain).
    // The fpp RATE estimates the full-table rate unbiasedly; counts
    // are sample counts, documented by the caller's mod.
    val sampled =
      if (factSampleMod == 1L) fact
      else fact.where(
        pmod(xxhash64(col(factKey), lit("fpp_sample")),
          lit(factSampleMod)) === 0L)
    sampled
      .withColumn("_pass", mightContainKey(bloom, col(factKey)))
      .join(dimKeys, col(factKey) === col("_dk"), "left")
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("_dk").isNotNull, 1L).otherwise(0L)).as("n_match"),
        sum(when(col("_dk").isNull, 1L).otherwise(0L)).as("n_nonmatch"),
        sum(when(col("_dk").isNull && col("_pass"), 1L).otherwise(0L))
          .as("n_false_pass"))
      .select(col("n_fact"), col("n_match"), col("n_nonmatch"),
        col("n_false_pass"),
        expr("coalesce(n_false_pass * 1000000 div nullif(n_nonmatch, 0), 0)")
          .as("observed_fpp_micro"),
        lit(designFppMicro).as("design_fpp_micro"))
  }
}
