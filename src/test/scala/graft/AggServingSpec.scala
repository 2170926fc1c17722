package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.ops.{Aggregations, Serving}

class AggServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val daily = Seq(
    ("2025-01-01", "A", 10.0), ("2025-01-01", "B", 5.0),
    ("2025-01-02", "A", 2.5), ("2025-01-02", "A", 2.5))
    .toDF("order_date", "product", "amount")

  test("A1 dailyRevenue groups, sums, rounds, sorts") {
    val got = Aggregations.dailyRevenue(daily).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      ("2025-01-01", "A", 10.0), ("2025-01-01", "B", 5.0),
      ("2025-01-02", "A", 5.0)))
  }

  test("A2 kpis computes grand total, distinct keys, row count in one pass") {
    val r = Aggregations.kpis(daily).collect().head
    assert(r.getDouble(0) === 20.0 && r.getLong(1) === 2L && r.getLong(2) === 4L)
  }

  test("A3 slidingRevenue puts each event into exactly 4 windows") {
    val df = Seq(("A", Timestamp.valueOf("2025-01-01 10:07:00"), 1.0))
      .toDF("product", "order_ts", "line_amount")
    val got = Aggregations.slidingRevenue(df).collect()
    assert(got.length === 4)
    val starts = got.map(_.getLong(1)).sorted
    // 10:07 floor to 15-min grid = 10:00; windows start 09:15..10:00
    val base = Timestamp.valueOf("2025-01-01 10:00:00").toInstant.getEpochSecond
    assert(starts.toSeq === Seq(base - 2700, base - 1800, base - 900, base))
    assert(got.forall(r => r.getLong(2) - r.getLong(1) === 3600))
  }

  test("A5/O4 topK orders by revenue desc with key tiebreak") {
    val got = Serving.topK(daily, "product", "amount", 2).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("A", 15.0), ("B", 5.0)))
  }

  test("A7 latestWindowLeaderboard keeps only the max window") {
    val df = Seq((1L, "A", 1.0), (1L, "B", 2.0), (2L, "A", 3.0), (2L, "B", 1.0))
      .toDF("w", "product", "v")
    val got = Serving.latestWindowLeaderboard(df, "w", "product", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("A", 3.0), ("B", 1.0)))
  }

  test("A8 windowHealth counts distinct keys per window, newest first") {
    val df = Seq((1L, 2L, "A", 1.0), (1L, 2L, "B", 2.0), (3L, 4L, "A", 5.0))
      .toDF("ws", "we", "product", "v")
    val got = Serving.windowHealth(df, "ws", "we", "product", "v", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq((3L, 5.0, 1L), (1L, 3.0, 2L)))
  }

  test("A9-approx summary lands within HLL tolerance of exact") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ws", col("ts").cast("long"))
      .withColumn("we", col("ws") + 900)
    val exact = Serving.summary(e, "event_type", "ws", "we", "ts")
      .collect().head
    val approx = Serving.summaryApprox(e, "event_type", "ws", "we", "ts")
      .collect().head
    assert(math.abs(approx.getLong(0) - exact.getLong(0)) <=
      math.max(1, exact.getLong(0) / 10))
    assert(math.abs(approx.getLong(1) - exact.getLong(1)) <=
      math.max(1, exact.getLong(1) / 10))
    assert(approx.getTimestamp(2) === exact.getTimestamp(2))
  }

  test("O2 sample sorts multi-key mixed-direction and limits") {
    val df = Seq((1, "b"), (2, "a"), (2, "b"), (1, "a")).toDF("k", "s")
    val got = Serving.sample(df, 3)(("k", false), ("s", true))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((2, "a"), (2, "b"), (1, "a")))
  }

  test("O5 distinctOn dedupes the key subset") {
    val df = Seq((1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    assert(Serving.distinctOn(df, Seq("a")).count() === 2)
  }

  test("weightedMedian: lower median by cumulative weight, tie-robust") {
    import graft.ops.Aggregations
    // group a: weights 1,1,10 on values 1,2,3 → total 12, first value
    // whose 2·cum reaches 12 is 3. group b: 2,2 on 5,7 → cum(5)=2,
    // 2·2 ≥ 4 → 5 (the LOWER weighted median on an even split).
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L),
      ("b", 5L, 2L), ("b", 7L, 2L))
      .toDF("g", "v", "w")
    val got = Aggregations.weightedMedian(df, "g", "v", "w")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq(("a", 3L, 12L), ("b", 5L, 4L)))
  }

  test("weightedMedian merges duplicate values before the cumsum") {
    import graft.ops.Aggregations
    // duplicate (g, v) rows must fold into one contracted row; the
    // median over {1×1, 1×1, 3×10} equals the median over {1×2, 3×10}
    val df = Seq(
      ("a", 1L, 1L), ("a", 1L, 1L), ("a", 3L, 10L))
      .toDF("g", "v", "w")
    val got = Aggregations.weightedMedian(df, "g", "v", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 3L, 12L)))
  }

  test("madOutliers: hand-computed median/MAD, outliers beyond 3 MAD") {
    import graft.ops.Aggregations
    // values 1,2,3,4,100: lower median (n=5) = 3; |x−3| = 2,1,0,1,97 →
    // sorted 0,1,1,2,97 → MAD = 1; outliers dd > 3·1: only 97 → 1 row
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "x")
    val r = Aggregations.madOutliers(df, "g", "x").collect().head
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("median") === 3L)
    assert(r.getAs[Long]("mad") === 1L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("pct_outliers") === 20.0)
    // a tight group has zero outliers; even n takes the LOWER median
    val tight = Seq(10L, 11L, 12L, 13L).map(("t", _)).toDF("g", "x")
    val t = Aggregations.madOutliers(tight, "g", "x").collect().head
    assert(t.getAs[Long]("median") === 11L)
    assert(t.getAs[Long]("mad") === 1L)
    assert(t.getAs[Long]("n_outliers") === 0L)
  }

  test("percentileBands: hand-computed discrete bands per group") {
    import graft.ops.Aggregations
    // group g: values 1..100 once each → p50=50, p90=90, p99=99
    val df = (1L to 100L).map(("g", _)).toDF("g", "v")
    val r = Aggregations.percentileBands(df, "g", "v").collect().head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("p50") === 50L)
    assert(r.getAs[Long]("p90") === 90L)
    assert(r.getAs[Long]("p99") === 99L)
    // heavy ties: 97×10 + 3×99 → p50=p90=10, p99=99
    val tied = (Seq.fill(97)(10L) ++ Seq.fill(3)(99L)).map(("t", _))
      .toDF("g", "v")
    val t = Aggregations.percentileBands(tied, "g", "v").collect().head
    assert(t.getAs[Long]("p50") === 10L)
    assert(t.getAs[Long]("p90") === 10L)
    assert(t.getAs[Long]("p99") === 99L)
  }

  test("gapFillDays: missing days come back as zero rows, range inclusive") {
    import graft.ops.Aggregations
    val daily = Seq((1L, 5L, 100L), (2L, 3L, 60L), (5L, 1L, 20L))
      .toDF("day", "n_events", "cents")
    val got = Aggregations.gapFillDays(daily, "day",
        Seq("n_events", "cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(
      (1L, 5L, 100L), (2L, 3L, 60L), (3L, 0L, 0L), (4L, 0L, 0L),
      (5L, 1L, 20L)))
  }

  test("weightedMedian windows the contraction, not the raw table") {
    import graft.ops.Aggregations
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => W}
    // the scale contract (q102 lesson): the keyed cumsum window's input
    // must be the (group, value) pre-aggregate — bounded by the value
    // domain — never the raw rows. Assert an Aggregate sits strictly
    // below every Window in the optimized plan (salt = 1: the direct-
    // window formulation; the salted default is gated separately below).
    val df = Seq(("a", 1L, 1L)).toDF("g", "v", "w")
    val plan = Aggregations.weightedMedian(df, "g", "v", "w", salt = 1)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: W => w }
    assert(windows.nonEmpty, "expected a window in the plan")
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"window input is not a contraction:\n$w")
    }
  }

  // every Window in the SALTED median-family plan must be segment-
  // bounded: either its partition spec includes the salt segment (the
  // per-(group, seg) local cumsum — a hot group occupies `salt` tasks),
  // or it runs over the (group, seg) segment-totals aggregate (≤ salt
  // rows per group, the offsets pass). The round-7 scale-killer was
  // exactly a window partitioned by a 3-value group key over a
  // corpus-sized contraction — this gate makes that shape unplannable
  // in the defaults.
  private def assertSegmentBounded(
      df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => W}
    val windows = df.queryExecution.optimizedPlan.collect { case w: W => w }
    assert(windows.nonEmpty, s"$what: expected windows in the plan")
    windows.foreach { w =>
      val saltedPartition =
        w.partitionSpec.exists(_.references.exists(_.name == "_seg"))
      val overSegmentTotals = w.child.collectFirst {
        case a: Aggregate
            if a.groupingExpressions.exists(
              _.references.exists(_.name == "_seg")) => a
      }.nonEmpty
      assert(saltedPartition || overSegmentTotals,
        s"$what: unsalted group-keyed window in the default plan:\n$w")
    }
  }

  test("salted branch: no unsalted group-keyed window in the median family") {
    import graft.ops.Aggregations
    // saltMinRows = 0 forces the branch the adaptive pick takes once
    // the contraction passes AdaptiveSaltRows — the regime the gate
    // exists for (below the threshold the direct window's input is
    // bounded by saltMinRows per construction, so the funnel is small)
    val df = Seq(("a", 1L, 1L)).toDF("g", "v", "w")
    assertSegmentBounded(
      Aggregations.weightedMedian(df, "g", "v", "w", saltMinRows = 0),
      "weightedMedian")
    val vals = Seq(("a", 1L)).toDF("g", "v")
    assertSegmentBounded(
      Aggregations.percentileBands(vals, "g", "v", saltMinRows = 0),
      "percentileBands")
    assertSegmentBounded(
      Aggregations.winsorizeStats(vals, "g", "v", saltMinRows = 0),
      "winsorizeStats")
    assertSegmentBounded(
      Aggregations.madOutliers(vals, "g", "v", saltMinRows = 0),
      "madOutliers")
    assertSegmentBounded(
      Aggregations.giniByGroup(vals, "g", "v", saltMinRows = 0),
      "giniByGroup")
  }

  test("adaptive pick: a small contraction keeps the direct window") {
    import graft.ops.Aggregations
    import org.apache.spark.sql.catalyst.plans.logical.{Window => W}
    // defaults on a tiny frame: the count lands under AdaptiveSaltRows
    // and the plan must be the direct keyed window (no _seg anywhere)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L)).toDF("g", "v", "w")
    val plan = Aggregations.weightedMedian(df, "g", "v", "w")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: W => w }
    assert(windows.nonEmpty)
    assert(!plan.toString.contains("_seg"),
      "expected the direct window below the adaptive threshold")
  }

  test("salted median family equals the direct-window formulation row-for-row") {
    import graft.ops.Aggregations
    // adversarial frame: one hot group (near-unique values), one tiny
    // group, heavy ties straddling would-be segment boundaries, and a
    // constant-valued group (degenerate order range)
    val rows =
      (1L to 400L).map(i => ("hot", i * 7 % 401, 1L + i % 3)) ++
      Seq(("tiny", 5L, 2L), ("tiny", 9L, 1L)) ++
      Seq.fill(50)(("tied", 10L, 1L)) ++ Seq.fill(50)(("tied", 20L, 1L)) ++
      Seq.fill(20)(("const", 42L, 3L))
    val df = rows.toDF("g", "v", "w")
    def sortedRows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(d.columns.map(col): _*).collect().toSeq
    for (salt <- Seq(2, 16)) {
      assert(sortedRows(Aggregations.weightedMedian(df, "g", "v", "w",
          salt = salt, saltMinRows = 0)) ===
        sortedRows(Aggregations.weightedMedian(df, "g", "v", "w", salt = 1)))
      assert(sortedRows(Aggregations.percentileBands(df, "g", "v",
          salt = salt, saltMinRows = 0)) ===
        sortedRows(Aggregations.percentileBands(df, "g", "v", salt = 1)))
      assert(sortedRows(Aggregations.winsorizeStats(df, "g", "v",
          salt = salt, saltMinRows = 0)) ===
        sortedRows(Aggregations.winsorizeStats(df, "g", "v", salt = 1)))
      assert(sortedRows(Aggregations.madOutliers(df, "g", "v",
          salt = salt, saltMinRows = 0)) ===
        sortedRows(Aggregations.madOutliers(df, "g", "v", salt = 1)))
      assert(sortedRows(Aggregations.giniByGroup(df, "g", "v",
          salt = salt, saltMinRows = 0)) ===
        sortedRows(Aggregations.giniByGroup(df, "g", "v", salt = 1)))
    }
  }

  test("giniByGroup: equality at 0, concentration at (n-1)/n, tie blocks exact") {
    import graft.ops.Aggregations
    val df = (Seq.fill(4)(("eq", 5L)) ++
      (Seq(0L, 0L, 0L, 10L).map(("conc", _))) ++
      Seq(("tie", 1L), ("tie", 1L), ("tie", 3L))).toDF("g", "v")
    val got = Aggregations.giniByGroup(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // conc: ranked 0,0,0,10 → G = 2·40/(4·10) − 5/4 = 0.75
    // tie: ranked 1,1,3 → Σi·x = 12 → G = 24/15 − 4/3 = 0.266667
    assert(got === Seq(
      ("conc", 4L, 10L, 0.75), ("eq", 4L, 20L, 0.0),
      ("tie", 3L, 5L, 0.266667)))
  }

  test("equiWidthHistogram: exact integer bounds, empty bins densified") {
    import graft.ops.Aggregations
    val df = Seq(0L, 19L).toDF("v")
    val got = Aggregations.equiWidthHistogram(df, "v", bins = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 20)
    assert(got.head === ((0L, 0L, 0L, 1L)))
    assert(got.last === ((19L, 19L, 19L, 1L)))
    assert(got.slice(1, 19).forall(_._4 === 0L))
    // uneven width: [0, 9] over 4 bins → widths 3,2,3,2 (integer
    // split) — the ceil spine is the exact inverse of the assignment
    // formula (o·4 div 10: offsets 0-2, 3-4, 5-7, 8-9)
    val u = Seq(0L, 3L, 5L, 9L).toDF("v")
    val g2 = Aggregations.equiWidthHistogram(u, "v", bins = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g2.map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 2L), (3L, 4L), (5L, 7L), (8L, 9L)))
    assert(g2.map(_._4).toSeq === Seq(1L, 1L, 1L, 1L))
    // every value is INSIDE its claimed bin bounds (the consistency
    // the floor spine violated: value 2 would count in a bin claiming
    // [0, 1])
    val u2 = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).toDF("v")
    val g2b = Aggregations.equiWidthHistogram(u2, "v", bins = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g2b.map(_._3).sum === 10L)
    assert(g2b.forall { case (lo, hi, n) => n === hi - lo + 1 })
    // bins > value range: surplus bins have an EMPTY integer span —
    // null bounds and zero count, never inverted hi < lo
    val narrow = Seq(10L, 11L, 12L).toDF("v")
    val g3 = Aggregations.equiWidthHistogram(narrow, "v", bins = 5)
      .collect()
    assert(g3.length === 5)
    val spans = g3.map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    // every value lands in a real span; empty spans carry no counts
    assert(spans.collect { case (Some(l), Some(h), _) => h - l + 1 }.sum
      === 3L)
    assert(spans.forall { case (l, h, n) =>
      (l.isDefined && h.isDefined && h.get >= l.get) ||
        (l.isEmpty && h.isEmpty && n === 0L) })
    assert(spans.map(_._3).sum === 3L)
  }

  test("topKValuesWithTies: dense-rank value classes, ties kept whole") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 9L), ("a", 8L), ("a", 7L),
      ("b", 5L)).toDF("g", "v")
    val got = Serving.topKValuesWithTies(df, "g", "v", k = 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // a: value 10 (2 rows) rank 1, 9 rank 2, 8 rank 3; 7 cut
    assert(got.toSeq === Seq(
      ("a", 1, 10L, 2L), ("a", 2, 9L, 1L), ("a", 3, 8L, 1L),
      ("b", 1, 5L, 1L)))
  }

  test("percentileNormalize: inclusive cume_dist in integer micro") {
    import graft.ops.Aggregations
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "v")
    val got = Aggregations.percentileNormalize(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", 1L, 2L, 500000L), ("a", 2L, 1L, 750000L),
      ("a", 3L, 1L, 1000000L)))
  }

  test("dailyAcf: 1.0 on a linear ramp, calendar pairing skips gap days") {
    import graft.ops.Aggregations
    // one event per day, value = day index → every lag correlates
    // exactly 1 (y is a constant shift of x over the overlap)
    val ramp = (0 until 12).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L), dd.toDouble))
      .toDF("ts", "value")
    val got = Aggregations.dailyAcf(ramp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 7)
    got.foreach { case (lag, nPairs, acf) =>
      assert(nPairs === 12L - lag)
      assert(acf === 1000000L, s"lag $lag")
    }
    // constant series → zero variance → null coefficient
    val const = (0 until 5).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L), 3.0)).toDF("ts", "value")
    Aggregations.dailyAcf(const, maxLag = 2).collect()
      .foreach(r => assert(r.isNullAt(2)))
    // a missing calendar day produces no pair at any lag it touches
    val gappy = Seq(0, 1, 3).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L), dd.toDouble))
      .toDF("ts", "value")
    val g = Aggregations.dailyAcf(gappy, maxLag = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(1L) === 1L) // only (0,1) — day 2 absent kills (2,3)
    assert(g(2L) === 1L) // only (1,3)
  }

  test("trendResidual: full-neighborhood gate, exact x7 residual, gap-aware") {
    import graft.ops.Aggregations
    // days 0..8, value = day → trend exists only for days 3..5; a
    // linear ramp has residual 0 there (7·v = Σ neighborhood)
    val ramp = (0 until 9).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L), dd.toDouble))
      .toDF("ts", "value")
    val got = Aggregations.trendResidual(ramp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === 9)
    assert(got(0L).isNullAt(2) && got(2L).isNullAt(2)) // edges gated
    (3L to 5L).foreach { dd =>
      assert(got(dd).getLong(2) === dd * 7L * 1000000L)
      assert(got(dd).getLong(3) === 0L, s"day $dd")
    }
    // a spike inside a flat series: resid_x7 = 7·(v+spike) − (7·v+spike)
    // = 6·spike at the spike day, −spike at gated-in neighbors
    val spiky = (0 until 9).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L),
        if (dd == 4) 11.0 else 1.0)).toDF("ts", "value")
    val s = Aggregations.trendResidual(spiky).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(s(4L).getLong(3) === 6L * 10000000L)
    assert(s(3L).getLong(3) === -10000000L)
    // a missing day un-gates every neighborhood it touches
    val gappy = Seq(0, 1, 2, 3, 5, 6, 7, 8).map(dd =>
      (new Timestamp(dd * 86400000L + 1000L), 1.0)).toDF("ts", "value")
    Aggregations.trendResidual(gappy).collect().foreach { r =>
      assert(r.isNullAt(2), s"day ${r.getLong(0)} should be gated")
    }
  }

  test("cusumChangepoints: closed prefix form equals the literal recursion; shift flags") {
    // 20 flat days at 100.0 then 10 days shifted to 130.0 — a +30%
    // sustained mean shift the per-day z-score would not clear
    val rows = (0 until 30).map { i =>
      (Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        if (i < 20) 100.0 else 130.0)
    }.toDF("ts", "value")
    val got = Aggregations.cusumChangepoints(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 30)
    // replay the literal recursion S_t = max(0, S_{t-1} + y_t) on the
    // same integer micros and the same mu/kappa derivation
    val vs = got.map(_._2)
    val mu = vs.sum / vs.length
    val kappa = mu / 20
    var sPos = 0L; var sNeg = 0L
    got.zip(vs).foreach { case ((_, _, gp, gn, fu, fd), v) =>
      sPos = math.max(0L, sPos + (v - mu - kappa))
      sNeg = math.max(0L, sNeg + (mu - kappa - v))
      assert(gp === sPos, "S+ mismatch")
      assert(gn === sNeg, "S- mismatch")
      assert(fu === (if (sPos > kappa * 4) 1L else 0L))
      assert(fd === (if (sNeg > kappa * 4) 1L else 0L))
    }
    // the shift is eventually flagged, and never before it happens
    assert(got.take(20).forall(_._5 === 0L), "false alarm pre-shift")
    assert(got.drop(20).exists(_._5 === 1L), "shift never flagged")
  }
}
