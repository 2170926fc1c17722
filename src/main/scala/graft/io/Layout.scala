package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — the data-skipping lever for
  * tables filtered on TWO independent columns. A plain sort clusters
  * one column perfectly and leaves the other scattered across every
  * file; interleaving the bits of both keys gives each file a tight
  * min/max span on BOTH columns (≈ √files reduction per dimension), so
  * parquet footer stats prune files for either predicate. At 100 TB
  * this is the difference between scanning a full table and scanning
  * the handful of files whose [min,max] actually overlap the filter —
  * the same layout trick Delta's OPTIMIZE ZORDER and Iceberg's
  * sort-order rewrite apply.
  *
  * All arithmetic is exact integer math on non-negative domains (no
  * `div`-vs-floor divergence), so the z-value is deterministic and
  * DuckDB-replayable (q188).
  */
object Layout {

  /** `bits`-wide bucket of a non-negative offset `c - lo` scaled over
    * the inclusive domain [lo, hi] — the exact-integer min-max binning
    * the histogram family uses. Constant-domain (hi == lo) collapses
    * to bucket 0. */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    // floor of a non-negative double ratio of exactly-representable
    // integers — identical IEEE ops on the DuckDB side (the oracle
    // uses the same floor(x*2^bits/span) form), so the bin is
    // engine-stable; c == hi lands in the highest OCCUPIED bin
    // (2^bits - 1 when the domain span is at least 2^bits; narrower
    // spans top out lower, which is harmless — no value can exceed
    // the bucket range either way), so no cap is needed
    when(hi <= lo, lit(0L)).otherwise(
      floor(((c - lo) * lit(1L << bits)) / (hi - lo + lit(1))))
  }

  /** Morton interleave of two `bits`-wide NON-NEGATIVE bucket columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Disjoint
    * target bits sum without carries, so the fold is a plain `+` chain
    * the optimizer constant-folds around — whole-stage codegen keeps
    * it in the scan's projection. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** [[zValue]] over raw numeric columns, binning each over its own
    * observed [min, max] (one tiny aggregate, attached as a 1-row
    * broadcast — no driver round-trip). Appends `outCol`. */
  def withZValue(df: DataFrame, colA: String, colB: String,
                 bits: Int = 16, outCol: String = "zv"): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).as("_loA"), max(col(colA)).as("_hiA"),
      min(col(colB)).as("_loB"), max(col(colB)).as("_hiB"))
    df.join(broadcast(bounds))
      .withColumn(outCol, zValue(
        rangeBucket(col(colA), col("_loA"), col("_hiA"), bits),
        rangeBucket(col(colB), col("_loB"), col("_hiB"), bits), bits))
      .drop("_loA", "_hiA", "_loB", "_hiB")
  }

  /** The data-skipping DECISION METRIC (the number a layout choice is
    * made on): how many of `numFiles` files' [min,max] footer
    * rectangles overlap a single-dimension probe, under the z-order
    * layout vs a plain sort on `colA` — one row per layout:
    * (layout, n_files, a_probe_files, b_probe_files). A file overlaps
    * an interval probe iff its span intersects it; files a probe does
    * NOT overlap are skipped without being read, so `*_probe_files /
    * n_files` IS the scan fraction.
    *
    * File models (both value-equal-width cuts — exactly what a
    * range-partitioned writer produces on ~uniform keys, and the q188
    * oracle convention): z-order files are equal-width z-curve
    * segments; sorted files are equal-width cuts of colA's bucket
    * domain. The expected result — a plain colA sort wins on colA-only
    * probes (1 file) but reads EVERYTHING on colB-only probes; z-order
    * pays a few files on either axis (≈ √numFiles per dimension) —
    * the reason a two-predicate workload z-orders.
    *
    * All arithmetic is the exact integer/IEEE math of [[withZValue]],
    * so the counts replay bit-for-bit in a cross-engine oracle. One
    * pass computes both layouts' rectangles: the bucket projection is
    * shared, and each profile is one numFiles-group aggregate. */
  def skippingComparison(df: DataFrame, colA: String, colB: String,
                         aProbe: (Long, Long), bProbe: (Long, Long),
                         bits: Int = 16, numFiles: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).as("_loA"), max(col(colA)).as("_hiA"),
      min(col(colB)).as("_loB"), max(col(colB)).as("_hiB"))
    val based = df.join(broadcast(bounds))
      .select(col(colA).as("a"), col(colB).as("b"),
        rangeBucket(col(colA), col("_loA"), col("_hiA"), bits).as("ba"),
        rangeBucket(col(colB), col("_loB"), col("_hiB"), bits).as("bb"))
      .withColumn("zv", zValue(col("ba"), col("bb"), bits))
    val zmax = based.agg(max(col("zv")).as("_zmax"))
    def rects(filed: DataFrame) = filed.groupBy(col("file"))
      .agg(min(col("a")).as("a_lo"), max(col("a")).as("a_hi"),
        min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
    val zfiles = rects(based.join(broadcast(zmax))
      .withColumn("file",
        floor(col("zv") * numFiles / (col("_zmax") + 1)).cast("long")))
    val sfiles = rects(based
      .withColumn("file",
        floor(col("ba") * numFiles / lit(1L << bits)).cast("long")))
    def overlaps(lo: Column, hi: Column, p: (Long, Long)): Column =
      when(lo <= p._2 && hi >= p._1, 1L).otherwise(0L)
    def profile(files: DataFrame, layout: String) = files
      .agg(count(lit(1)).as("n_files"),
        sum(overlaps(col("a_lo"), col("a_hi"), aProbe)).as("a_probe_files"),
        sum(overlaps(col("b_lo"), col("b_hi"), bProbe)).as("b_probe_files"))
      .select(lit(layout).as("layout"), col("n_files"),
        col("a_probe_files"), col("b_probe_files"))
    profile(zfiles, "zorder").unionAll(profile(sfiles, "sorted_a"))
      .orderBy(col("layout").desc)
  }

  /** Write `df` as parquet z-ordered on (colA, colB): range-partition
    * by z-value into `numFiles` output tasks (each file covers one
    * compact z-curve segment = one tight rectangle in (A, B) space),
    * sorted within files so row groups inherit the clustering too.
    * The z-value is layout-only — dropped before writing. */
  def zorderedParquet(df: DataFrame, colA: String, colB: String,
                      out: String, numFiles: Int = 16,
                      bits: Int = 16): Unit =
    withZValue(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(out)
}
