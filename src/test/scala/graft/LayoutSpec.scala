package graft

import org.apache.spark.sql.functions._

import graft.io.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on plain Scala ints. */
  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i + 1)) + (((b >> i) & 1L) << (2 * i))
    }.sum

  test("zValue matches the reference Morton interleave") {
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .withColumn("zv", Layout.zValue(col("a"), col("b"), 4))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === mortonRef(a, b, 4), s"($a, $b)")
    }
    // the curve is a bijection on the grid
    assert(got.values.toSet.size === rows.size)
  }

  test("rangeBucket is monotone, hits both ends, never overflows") {
    val df = (0L to 1000L).toDF("v")
    val b = df.select(Layout.rangeBucket(
        col("v"), lit(0L), lit(1000L), 4).as("b"))
      .collect().map(_.getLong(0))
    assert(b.head === 0L && b.last === 15L)
    assert(b.min === 0L && b.max === 15L)
    assert(b.sliding(2).forall(p => p(0) <= p(1)), "non-monotone")
  }

  test("z-ordered layout bounds BOTH columns per file; a plain sort " +
      "bounds only its own") {
    // 64x64 grid, 16 output files -> z-order should give each file a
    // ~16x16 rectangle (span ~1/4 of each domain); sorting by a alone
    // leaves b spanning the full domain in every file
    val grid = (0 until 4096).map(i => (i % 64L, i / 64L))
      .toDF("a", "b")
    def fileSpans(dir: String): (Double, Double) = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val sDir = java.nio.file.Files.createTempDirectory("asort").toString
    try {
      Layout.zorderedParquet(grid, "a", "b", zDir, numFiles = 16, bits = 6)
      grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
        .write.mode("overwrite").parquet(sDir)
      val (za, zb) = fileSpans(zDir)
      val (sa, sb) = fileSpans(sDir)
      // both dimensions tight under z-order (63 = full span)
      assert(za < 32 && zb < 32, s"z-order spans a=$za b=$zb")
      // the plain sort clusters a but scatters b across the whole range
      assert(sa < 16, s"sorted layout should cluster a, span $sa")
      assert(sb > 48, s"sorted layout should scatter b, span $sb")
      // layout must not change content
      val round = spark.read.parquet(zDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(round.toSeq === grid.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    } finally {
      Seq(zDir, sDir).foreach(d => org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d)))
    }
  }

  test("skippingComparison: z-order prunes on both axes, a plain sort " +
      "only on its own") {
    // 64x64 grid with b decorrelated from a via a multiplicative hash
    val grid = (0L until 4096L)
      .map(i => (i, (i * 2654435761L) % 4096L)).toDF("a", "b")
    val out = Layout.skippingComparison(grid, "a", "b",
        aProbe = (100L, 200L), bProbe = (100L, 200L),
        bits = 12, numFiles = 16)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (zn, za, zb) = out("zorder")
    val (sn, sa, sb) = out("sorted_a")
    assert(zn === 16L && sn === 16L)
    // plain a-sort: the a-probe (2.5% of the domain) hits ~1 file, but
    // every file spans the whole b domain -> b-probe reads everything
    assert(sa <= 2L, s"sorted_a a_probe_files=$sa")
    assert(sb === 16L, s"sorted_a b_probe_files=$sb")
    // z-order: bounded on BOTH axes — each probe skips most files
    assert(za < 16L && zb < 16L, s"zorder a=$za b=$zb")
    assert(zb < sb, "z-order must beat the sort on the scattered axis")
  }
}
