package graft

import org.apache.spark.sql.functions._

import graft.ext.Profiling
import graft.io.Sinks

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile emits one stats row per column from a single pass") {
    val df = Seq((1.0, 10L), (2.0, 20L), (4.0, 20L))
      .toDF("a", "b")
      .unionByName(Seq((Option.empty[Double], Option(30L)))
        .toDF("a", "b"))
    val got = Profiling.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) === 4L)      // n
    assert(a.getLong(2) === 1L)      // n_null
    assert(a.getLong(3) === 3L)      // n_distinct (nulls excluded)
    assert(a.getDouble(4) === 1.0 && a.getDouble(5) === 4.0)
    assert(a.getDouble(6) === 2.3333) // trunc4 of 7/3
    assert(got("b").getLong(3) === 3L)
  }

  test("profileApprox matches exact counts and estimates distincts within rsd") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_quantity", "l_extendedprice", "l_partkey")
    val exact = Profiling.profile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val apx = Profiling.profileApprox(li, cols, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r).toMap
    // the plan must be a plain aggregate — no Expand row replication
    val plan = Profiling.profileApprox(li, cols)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile expanded rows:\n$plan")
    // r16: the exact profile no longer pays the Expand replication
    // either — distinct counts run as per-column value contractions
    // cross-joined (1-row broadcasts) onto the plain base aggregate
    assert(!Profiling.profile(li, cols)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact profile must not expand rows (per-column contractions)")
    cols.foreach { c =>
      // n / n_null / min / max / mean are exact in both variants
      assert(apx(c).getLong(1) === exact(c).getLong(1))
      assert(apx(c).getLong(2) === exact(c).getLong(2))
      assert(apx(c).getDouble(4) === exact(c).getDouble(4))
      assert(apx(c).getDouble(5) === exact(c).getDouble(5))
      assert(apx(c).getDouble(6) === exact(c).getDouble(6))
      val (e, a) = (exact(c).getLong(3).toDouble, apx(c).getLong(3).toDouble)
      assert(math.abs(a - e) / e <= 0.06, s"$c distinct est $a vs exact $e")
    }
  }

  test("fileUri leaves scheme-qualified paths alone and prefixes bare paths") {
    assert(Sinks.fileUri("hdfs://nn:8020/x") === "hdfs://nn:8020/x")
    assert(Sinks.fileUri("file:///x") === "file:///x")
    assert(Sinks.fileUri("/tmp/x") === "file:///tmp/x")
  }

  test("keySkew: uniform keys score gini 0, hot key dominates the shares") {
    val uniform = (1 to 10).flatMap(k => Seq.fill(4)(k)).toDF("k")
    val u = Profiling.keySkew(uniform, "k").collect().head
    assert(u.getAs[Long]("n_keys") === 10L)
    assert(u.getAs[Long]("n_rows") === 40L)
    assert(u.getAs[Double]("top1_share") === 0.1)
    assert(u.getAs[Double]("gini") === 0.0)

    // key 1 owns 91 of 100 rows, keys 2..10 one each
    val hot = (Seq.fill(91)(1) ++ (2 to 10)).toDF("k")
    val h = Profiling.keySkew(hot, "k").collect().head
    assert(h.getAs[Double]("top1_share") === 0.91)
    assert(h.getAs[Double]("top10_share") === 1.0)
    // ascending x = (1×9, 91): G = 2·(1+2+…+9 + 10·91)/(10·100) − 11/10
    val expected = BigDecimal(2.0 * (45 + 910) / 1000.0 - 1.1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h.getAs[Double]("gini") === expected)
  }

  test("heavyHitters: every true heavy hitter survives the MG summary") {
    // 100 rows: a=50, b=30, 20 singletons; capacity 4 → threshold 25
    // → true heavy hitters {a, b}; the candidate recount must find both
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 20).map(i => s"x$i")
    val r = Profiling.heavyHitters(rows.toDF("k"), "k", capacity = 4)
      .collect().head
    assert(r.getAs[Long]("n_rows") === 100L)
    assert(r.getAs[Long]("capacity") === 4L)
    assert(r.getAs[Long]("threshold") === 25L)
    assert(r.getAs[Long]("n_true_hh") === 2L)
    // no key above threshold → zero found, still deterministic
    val flat = (1 to 50).map(i => s"k${i % 10}").toDF("k")
    val f = Profiling.heavyHitters(flat, "k", capacity = 4).collect().head
    assert(f.getAs[Long]("n_true_hh") === 0L)
  }

  test("joinCardinality: exact fan-out sum and worst-key contribution") {
    // left keys 1,1,2,3 × right keys 1,2,2,4 → common {1,2};
    // out = 2·1 + 1·2 = 4; worst key contributes 2 either way
    val left = Seq(1L, 1L, 2L, 3L).toDF("lk")
    val right = Seq(1L, 2L, 2L, 4L).toDF("rk")
    val r = Profiling.joinCardinality(left, right, "lk", "rk")
      .collect().head
    assert(r.getAs[Long]("n_left") === 4L)
    assert(r.getAs[Long]("n_right") === 4L)
    assert(r.getAs[Long]("n_keys_left") === 3L)
    assert(r.getAs[Long]("n_keys_right") === 3L)
    assert(r.getAs[Long]("n_keys_common") === 2L)
    assert(r.getAs[Long]("out_rows") === 4L)
    assert(r.getAs[Long]("max_key_out") === 2L)
    // the estimate IS the real join size
    assert(left.join(right, col("lk") === col("rk")).count() === 4L)
    // disjoint keys: zero everything except the side totals
    val z = Profiling.joinCardinality(left, Seq(9L).toDF("rk"), "lk", "rk")
      .collect().head
    assert(z.getAs[Long]("n_keys_common") === 0L)
    assert(z.getAs[Long]("out_rows") === 0L)
    assert(z.getAs[Long]("max_key_out") === 0L)
  }

  test("keySkew closed form equals the row_number formulation on tied counts") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties (the closed-form's interesting case): counts
    // 1×5, 2×4, 3×3, 7×2, 20×1 across 15 keys — tie blocks straddle
    // the top-10 boundary so the clamp arithmetic is exercised
    val rows = (1 to 5).flatMap(k => Seq.fill(1)(k)) ++
      (6 to 9).flatMap(k => Seq.fill(2)(k)) ++
      (10 to 12).flatMap(k => Seq.fill(3)(k)) ++
      (13 to 14).flatMap(k => Seq.fill(7)(k)) ++ Seq.fill(20)(15)
    val df = rows.toDF("k")
    val got = Profiling.keySkew(df, "k").collect().head
    // reference: the direct ranked-window formulation
    val counts = df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .withColumn("i", row_number().over(Window.orderBy(col("cnt"), col("k"))))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("k"))))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        sum(col("i") * col("cnt")).as("iwsum"),
        sum(when(col("rk") === 1, col("cnt")).otherwise(0L)).as("top1"),
        sum(when(col("rk") <= 10, col("cnt")).otherwise(0L)).as("topk"))
      .collect().head
    assert(got.getAs[Long]("n_keys") === counts.getAs[Long]("n_keys"))
    assert(got.getAs[Long]("n_rows") === counts.getAs[Long]("n_rows"))
    val nk = counts.getAs[Long]("n_keys").toDouble
    val nr = counts.getAs[Long]("n_rows")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("top1_share") ===
      r6(counts.getAs[Long]("top1").toDouble / nr))
    assert(got.getAs[Double]("top10_share") ===
      r6(counts.getAs[Long]("topk").toDouble / nr))
    assert(got.getAs[Double]("gini") ===
      r6(2.0 * counts.getAs[Long]("iwsum") / (nk * nr) - (nk + 1) / nk))
  }

  test("corrMatrix: exact ±1 on linear columns, null on a constant column") {
    val df = Seq((1.0, 2.0, -1.0, 7.0), (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0), (4.0, 8.0, -4.0, 7.0))
      .toDF("x", "y2x", "yneg", "konst")
    val got = Profiling.corrMatrix(df, Seq("x", "y2x", "yneg", "konst"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(got(("x", "y2x")) === Some(1.0))
    assert(got(("x", "yneg")) === Some(-1.0))
    assert(got(("x", "konst"))  === None) // zero variance → undefined
    assert(got(("y2x", "yneg")) === Some(-1.0))
    assert(got.size === 6)
  }

  test("mutualInfo: 0 for independent columns, H(x) and NMI 1 when y = x") {
    // 2×2 uniform independent grid
    val indep = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("x", "y")
    val i = Profiling.mutualInfo(indep, "x", "y").collect().head
    assert(i.getAs[Long]("mi_micro") === 0L)
    assert(i.getAs[Long]("h_x_micro") === 693147L) // ln 2
    assert(i.getAs[Double]("nmi") === 0.0)

    // y fully determined by x, uniform over 2 values → MI = H = ln 2
    val dep = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b"))
      .toDF("x", "y")
    val d = Profiling.mutualInfo(dep, "x", "y").collect().head
    assert(d.getAs[Long]("mi_micro") === 693147L)
    assert(d.getAs[Double]("nmi") === 1.0)
  }

  test("benford: lexical first significant digit, zeros/nulls dropped") {
    val df = Seq[Option[Double]](
      Some(1.0), Some(1.5), Some(19.0),   // digit 1 ×3
      Some(0.02),                          // leading zeros skipped → 2
      Some(0.91),                          // → 9
      Some(300.0), Some(-4.5),             // 3; sign ignored → 4
      Some(0.0), None)                     // dropped
      .toDF("value")
    val got = Profiling.benford(df, "value").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("1", "2", "3", "4", "9"))
    assert(got("1").getAs[Long]("n") === 3L)
    assert(got("2").getAs[Long]("n") === 1L)
    // expected share of digit 1 = log10(2) ≈ 0.301030
    assert(got("1").getAs[Long]("exp_micro") === 301030L)
    // observed share 3/7
    assert(got("1").getAs[Long]("obs_micro") ===
      math.round(3.0 / 7 * 1e6))
  }

  test("psiDrift: 0 on identical snapshots, hand-computed value on a known shift") {
    import org.apache.spark.sql.functions.col
    // both snapshots 50/50 over two values → every bucket share equal
    val same = (1 to 100).map(i => (i % 2, if (i % 4 < 2) 1.0 else 2.0))
      .toDF("snap", "value")
    val s = Profiling.psiDrift(same, "value", col("snap")).collect().head
    assert(s.getAs[Long]("psi_micro") === 0L)

    // 2-bucket case: ref 50/50, cur 25/75 →
    // psi = 0.25·ln 2 + 0.25·ln 1.5 ≈ 0.274653
    val ref = Seq.fill(50)((0, 1.0)) ++ Seq.fill(50)((0, 2.0))
    val cur = Seq.fill(25)((1, 1.0)) ++ Seq.fill(75)((1, 2.0))
    val r = Profiling.psiDrift((ref ++ cur).toDF("snap", "value"),
      "value", col("snap"), buckets = 2).collect().head
    assert(r.getAs[Long]("n_ref") === 100L)
    assert(r.getAs[Long]("n_cur") === 100L)
    assert(r.getAs[Long]("n_scored_buckets") === 2L)
    assert(r.getAs[Long]("psi_micro") === 274653L)
  }

  test("ksTest: hand-computed sup over integer cross-differences") {
    import graft.ext.Profiling
    // side0 {1,2,3}, side1 {3,4}: D = max|c0·n1 − c1·n0| = 4 at v=2,
    // ks = 4/(3·2) = 0.666667 → 666667 micro
    val df = Seq((1L, 0), (2L, 0), (3L, 0), (3L, 1), (4L, 1))
      .toDF("v", "side")
    val r = Profiling.ksTest(df, "v", col("side")).collect().head
    assert(r.getAs[Long]("n_0") === 3L)
    assert(r.getAs[Long]("n_1") === 2L)
    assert(r.getAs[Long]("n_values") === 4L)
    assert(r.getAs[Long]("ks_micro") === 666667L)
    // identical distributions → 0; disjoint → 1e6
    val same = Seq((1L, 0), (2L, 0), (1L, 1), (2L, 1)).toDF("v", "side")
    assert(Profiling.ksTest(same, "v", col("side")).collect()
      .head.getAs[Long]("ks_micro") === 0L)
    val disj = Seq((1L, 0), (2L, 1)).toDF("v", "side")
    assert(Profiling.ksTest(disj, "v", col("side")).collect()
      .head.getAs[Long]("ks_micro") === 1000000L)
  }

  test("chiSquare: independence gives 0; empty grid cells are counted") {
    import graft.ext.Profiling
    // perfectly independent 2×2 (all cells 5) → χ² = 0, dof = 1
    val ind = (Seq.fill(5)(("a", 0)) ++ Seq.fill(5)(("a", 1)) ++
      Seq.fill(5)(("b", 0)) ++ Seq.fill(5)(("b", 1))).toDF("x", "y")
    val r = Profiling.chiSquare(ind, "x", "y").collect().head
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("n_cells") === 4L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("chi2_micro") === 0L)
    // diagonal-only 2×2: observed cells (a,0)=2 and (b,1)=2, the two
    // EMPTY cells each contribute their expected count 1 → χ² = 4
    // (full-grid brute force), which the closed form must reproduce
    val diag = (Seq.fill(2)(("a", 0)) ++ Seq.fill(2)(("b", 1)))
      .toDF("x", "y")
    val d = Profiling.chiSquare(diag, "x", "y").collect().head
    assert(d.getAs[Long]("n_cells") === 2L)
    assert(d.getAs[Long]("dof") === 1L)
    assert(d.getAs[Long]("chi2_micro") === 4000000L)
  }

  test("coverageK: closed-form k@p over tie blocks") {
    import graft.ext.Profiling
    // a×8, b×1, c×1: k50 = 1 (5 of a's 8), k90 = 2, k99 = 3
    val df = (Seq.fill(8)("a") ++ Seq("b", "c")).toDF("k")
    val r = Profiling.coverageK(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("k50") === 1L)
    assert(r.getAs[Long]("k90") === 2L)
    assert(r.getAs[Long]("k99") === 3L)
    // tie block: x×5, y×5 — interchangeable keys, ceil split
    val tie = (Seq.fill(5)("x") ++ Seq.fill(5)("y")).toDF("k")
    val t = Profiling.coverageK(tie, "k").collect().head
    assert(t.getAs[Long]("k50") === 1L)
    assert(t.getAs[Long]("k90") === 2L)
  }

  test("mannWhitney: hand-computed 2U and tie-corrected z") {
    import graft.ext.Profiling
    // side0 {1,2,2}, side1 {2,3}: per-value (a,b): 1→(1,0), 2→(2,1),
    // 3→(0,1). 2U_b = 1·(2·1+2) + 1·(2·3+0) = 10; ties Σt³−t = 24;
    // z = (10 − 3·2) / (2·√(3·2/12·((5+1) − 24/(5·4)))) = 4/(2·√2.4)
    val df = Seq((1L, 0), (2L, 0), (2L, 0), (2L, 1), (3L, 1))
      .toDF("v", "side")
    val r = Profiling.mannWhitney(df, "v", col("side")).collect().head
    assert(r.getAs[Long]("n_0") === 3L)
    assert(r.getAs[Long]("n_1") === 2L)
    assert(r.getAs[Long]("n_values") === 3L)
    assert(r.getAs[Long]("u2_b") === 10L)
    assert(r.getAs[Long]("z_micro") ===
      math.round(4.0 / (2.0 * math.sqrt(2.4)) * 1e6))
    // identical distributions → 2U = n0·n1, z = 0
    val same = Seq((1L, 0), (2L, 0), (1L, 1), (2L, 1)).toDF("v", "side")
    val s = Profiling.mannWhitney(same, "v", col("side")).collect().head
    assert(s.getAs[Long]("u2_b") === 4L)
    assert(s.getAs[Long]("z_micro") === 0L)
    // all values tied → zero variance → null z
    val const = Seq((5L, 0), (5L, 0), (5L, 1)).toDF("v", "side")
    assert(Profiling.mannWhitney(const, "v", col("side")).collect()
      .head.isNullAt(4))
  }

  test("effectSizes: V and U are 1 on identity, 0/null on independence") {
    import graft.ext.Profiling
    // y = x exactly → Cramér's V = 1, both Theil U = 1
    val dep = (Seq.fill(5)(("a", "a")) ++ Seq.fill(5)(("b", "b")))
      .toDF("x", "y")
    val d = Profiling.effectSizes(dep, "x", "y").collect().head
    assert(d.getAs[Long]("n") === 10L)
    assert(d.getAs[Long]("n_cells") === 2L)
    assert(d.getAs[Double]("cramers_v") === 1.0)
    assert(math.abs(d.getAs[Double]("theils_u_xy") - 1.0) < 1e-5)
    assert(math.abs(d.getAs[Double]("theils_u_yx") - 1.0) < 1e-5)
    // perfectly independent uniform 2×2 → χ² = 0 ⇒ V null, U = 0
    val ind = (Seq.fill(5)(("a", 0)) ++ Seq.fill(5)(("a", 1)) ++
      Seq.fill(5)(("b", 0)) ++ Seq.fill(5)(("b", 1))).toDF("x", "y")
    val i = Profiling.effectSizes(ind, "x", "y").collect().head
    assert(i.isNullAt(2)) // chi2 = 0 → no positive V
    assert(i.getAs[Double]("theils_u_xy") === 0.0)
    assert(i.getAs[Double]("theils_u_yx") === 0.0)
  }

  test("joinStrategyAudit: broadcast, bloom, and salted branches fire " +
      "on their trigger shapes") {
    import graft.ext.Profiling
    // hot key 1 x4000 + 6000 unmatched keys; right side 100 unique keys
    val left = ((1 to 4000).map(_ => 1L) ++
      (10001L to 16000L)).toDF("lk")
    val right = (1L to 100L).toDF("rk")
    // small right under the row limit -> broadcast, everything else moot
    val b = Profiling.joinStrategyAudit(left, right, "lk", "rk",
      broadcastRowLimit = 1000L).collect().head
    assert(b.getAs[String]("strategy") === "broadcast")
    // force the shuffle path: matched 4000/10000 = 0.4 < 0.5 -> bloom_;
    // one key contributes 4000/4000 = 100% of output -> _salted
    val s = Profiling.joinStrategyAudit(left, right, "lk", "rk",
      broadcastRowLimit = 10L).collect().head
    assert(s.getAs[Long]("n_left") === 10000L)
    assert(s.getAs[Long]("n_right") === 100L)
    assert(s.getAs[Long]("out_rows") === 4000L)
    assert(s.getAs[Long]("max_key_out") === 4000L)
    assert(s.getAs[Long]("probe_match_micro") === 400000L)
    assert(s.getAs[Long]("skew_micro") === 1000000L)
    assert(s.getAs[String]("strategy") === "bloom_shuffle_salted")
    // full-match unskewed shape -> plain shuffle
    val even = (1L to 100L).flatMap(k => Seq(k, k)).toDF("lk")
    val p = Profiling.joinStrategyAudit(even, right, "lk", "rk",
      broadcastRowLimit = 10L).collect().head
    assert(p.getAs[String]("strategy") === "shuffle")
  }

  test("dispatchJoin routes every strategy branch and each stays " +
      "row-identical to the plain join") {
    import graft.ext.Profiling
    def plain(l: org.apache.spark.sql.DataFrame,
              r: org.apache.spark.sql.DataFrame) =
      l.join(r, col("lk") === col("rk"))
        .select("lk", "payload", "rk", "attr").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getString(3))).sorted.toSeq
    def routed(l: org.apache.spark.sql.DataFrame,
               r: org.apache.spark.sql.DataFrame,
               limit: Long): (String, Seq[(Long, Long, Long, String)]) = {
      val (strat, j) = Profiling.dispatchJoin(l, r, "lk", "rk",
        broadcastRowLimit = limit, salt = 4)
      (strat, j.select("lk", "payload", "rk", "attr").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getString(3))).sorted.toSeq)
    }
    val right = (1L to 100L).map(k => (k, s"a$k")).toDF("rk", "attr")
    // hot key 1 + unmatched tail -> bloom_shuffle_salted at limit 10
    val skewed = ((1 to 4000).map(_ => 1L) ++ (10001L to 16000L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("lk", "payload")
    val (s1, r1) = routed(skewed, right, 10L)
    assert(s1 === "bloom_shuffle_salted")
    assert(r1.nonEmpty && r1 === plain(skewed, right))
    // same shape under the row limit -> broadcast
    val (s2, r2) = routed(skewed, right, 1000L)
    assert(s2 === "broadcast")
    assert(r2 === plain(skewed, right))
    // full-match unskewed -> plain shuffle
    val even = (1L to 100L).flatMap(k => Seq(k, k))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("lk", "payload")
    val (s3, r3) = routed(even, right, 10L)
    assert(s3 === "shuffle")
    assert(r3.nonEmpty && r3 === plain(even, right))
    // selective match, NO skew -> bloom_shuffle: 100 matched of 10100
    // left rows, each matched key contributing ~1% of output
    val sel = ((1L to 100L) ++ (10001L to 20000L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("lk", "payload")
    val (s4, r4) = routed(sel, right, 10L)
    assert(s4 === "bloom_shuffle")
    assert(r4.nonEmpty && r4 === plain(sel, right))
    // skewed but full-match -> shuffle_salted: one hot key dominates
    // output while every left row matches (no bloom win)
    val hotFull = ((1 to 4000).map(_ => 1L) ++ (2L to 100L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("lk", "payload")
    val (s5, r5) = routed(hotFull, right, 10L)
    assert(s5 === "shuffle_salted")
    assert(r5.nonEmpty && r5 === plain(hotFull, right))
  }

  test("calibrationStats: perfect calibration gives ECE 0; gaps are measured") {
    import spark.implicits._
    // bin 2 (conf .25): 4 rows, 1 positive -> acc .25, gap 0
    // bin 7 (conf .75): 4 rows, 3 positive -> acc .75, gap 0
    val calibrated = (Seq.fill(3)((250000L, 0L)) ++ Seq((250000L, 1L)) ++
      Seq.fill(3)((750000L, 1L)) ++ Seq((750000L, 0L)))
      .toDF("conf", "lbl")
    val got = Profiling.calibrationStats(calibrated, col("conf"),
      col("lbl")).collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getLong(4) === 0L, s"gap in bin ${r.getLong(0)}")
      assert(r.getLong(5) === 0L, "ece")
    }
    assert(got.map(_.getLong(0)).toSet === Set(2L, 7L))
    // overconfident: conf .95 on coin flips -> gap 450000, ece too
    val over = (Seq.fill(2)((950000L, 1L)) ++ Seq.fill(2)((950000L, 0L)))
      .toDF("conf", "lbl")
    val row = Profiling.calibrationStats(over, col("conf"), col("lbl"))
      .collect()
    assert(row.length === 1 && row.head.getLong(0) === 9L)
    assert(row.head.getLong(4) === 450000L && row.head.getLong(5) === 450000L)
    // conf exactly 1.0 lands in the top bin, not one past it
    val edge = Seq((1000000L, 1L)).toDF("conf", "lbl")
    assert(Profiling.calibrationStats(edge, col("conf"), col("lbl"))
      .collect().head.getLong(0) === 9L)
  }

  test("refIntegrityStats: orphans both ways, dup keys counted once") {
    val left = Seq(1L, 2L, 3L, 3L, 4L).toDF("lid")   // dup key 3
    val right = Seq(2L, 3L, 5L).toDF("rid")
    val r = Profiling.refIntegrityStats(left, right, "lid", "rid")
      .collect()(0)
    // distinct left {1,2,3,4}, right {2,3,5}, matched {2,3}
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L &&
      r.getLong(2) === 2L)
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L)
    assert(r.getLong(5) === 500000L)            // 2/4
    assert(r.getLong(6) === 2000000L / 3L)      // 2/3 floored
  }

  test("groupEntropyStats: monoculture 0, uniform ln k, dominant tie-break") {
    val df = Seq(
      ("mono", "en"), ("mono", "en"), ("mono", "en"),
      ("half", "en"), ("half", "fr"),
      ("tie", "de"), ("tie", "en"))  // equal counts: top ties to 'de'
      .toDF("g", "v")
    val got = Profiling.groupEntropyStats(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getLong(5))).toMap
    assert(got("mono") === (3L, 1L, 0L, "en", 1000000L))
    // two equal halves: H = ln 2 = 0.693147...
    assert(got("half")._3 === 693147L)
    assert(got("half")._5 === 500000L)
    // tie on counts -> smallest value string wins
    assert(got("tie")._4 === "de")
  }

  // ===== delay advisors =====================================================

  private def tsOf(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  test("watermarkAdvisor: per-key running-max lateness, digit buckets, " +
      "advised covers the target") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, tsOf(1100)), (2L, 1L, tsOf(1200)),
      (3L, 1L, tsOf(1195)),                       // 5 s late  -> bucket 1
      (4L, 1L, tsOf(1300)), (5L, 1L, tsOf(1100))) // 200 s late -> bucket 3
      .toDF("event_id", "user_id", "ts")
    val got = Profiling.watermarkAdvisor(ev, coverMicro = 600000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((3L, 0L, 600000L, 1L)))   // in-order; advised here
    assert(got(1L) === ((1L, 5L, 800000L, 0L)))
    assert(got(3L) === ((1L, 200L, 1000000L, 0L)))
  }

  test("sessionGapAdvisor: lag gaps per key, first events dropped") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, tsOf(1000)), (2L, 1L, tsOf(1010)), // gap 10  -> bucket 2
      (3L, 1L, tsOf(1100)),                       // gap 90  -> bucket 2
      (4L, 2L, tsOf(5000)))                       // lone event: no gap
      .toDF("event_id", "user_id", "ts")
    val got = Profiling.sessionGapAdvisor(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq((2L, 2L, 90L, 1000000L, 1L)))
  }

  // ===== per-group signal agreement =========================================

  test("signalAgreementStats: rho +1e6 on agreement, -1e6 on reversal, " +
      "1e6 convention on singletons") {
    import spark.implicits._
    val df = Seq(
      ("agree", 1L, 10L, 100L), ("agree", 2L, 20L, 200L),
      ("agree", 3L, 30L, 300L),
      ("rev", 4L, 1L, 9L), ("rev", 5L, 2L, 8L), ("rev", 6L, 3L, 7L),
      ("lone", 7L, 5L, 5L))
      .toDF("source", "doc_id", "a", "b")
    val got = Profiling.signalAgreementStats(df, "source",
        col("a"), col("b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got("agree") === ((3L, 1000000L)))
    assert(got("rev") === ((3L, -1000000L)))
    assert(got("lone") === ((1L, 1000000L)))
  }
}
