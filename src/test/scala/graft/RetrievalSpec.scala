package graft

import graft.ext.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: shared ids sum both reciprocals, singletons keep one, ties on id") {
    // ranker A: docs 1,2,3 at ranks 1,2,3; ranker B: docs 3,4 at 1,2
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("id", "rank")
    val got = Retrieval.rrf(Seq(a, b), c = 60, topK = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    def contrib(rank: Int) = math.round(1e6 / (60 + rank))
    // doc 3: rank 3 in A + rank 1 in B — the only two-ranker doc, and
    // its fused score beats everyone's single contribution
    assert(got(3L) === ((2L, contrib(3) + contrib(1), 1L)))
    assert(got(1L) === ((1L, contrib(1), 2L)))
    assert(got(2L) === ((1L, contrib(2), 3L))) // ties with 4 → lower id first
    assert(got(4L) === ((1L, contrib(2), 4L)))
    assert(got(2L)._2 === got(4L)._2)
    assert(got(2L)._3 < got(4L)._3)
  }

  test("rrf: topK truncates after fusion, not per ranker") {
    val a = (1L to 30L).map(i => (i, i.toInt)).toDF("id", "rank")
    val got = Retrieval.rrf(Seq(a), topK = 5).collect()
    assert(got.length === 5)
    assert(got.map(_.getLong(0)).toSeq === (1L to 5L))
  }

  test("featureRerank: integer min-max per feature, missing = 0, " +
      "constant feature = 0, ties on id") {
    val cand = Seq(1L, 2L, 3L, 4L).toDF("id")
    // f1 spans [10, 30]: norms 0 / 500000 / 1000000; id 4 missing → 0
    val f1 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "s")
    // f2 constant over candidates → all norms 0 (hi == lo)
    val f2 = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)).toDF("id", "s")
    val got = Retrieval.featureRerank(cand,
        Seq((f1, "s", 2L), (f2, "s", 5L)), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (3L, 2000000L, 1L), (2L, 1000000L, 2L),
      (1L, 0L, 3L), (4L, 0L, 4L))) // 0-score tie → lower id first
  }

  test("featureRerank: non-candidate feature rows are ignored") {
    val cand = Seq(1L, 2L).toDF("id")
    // id 99 would widen the bounds to [0, 100] if not excluded
    val f = Seq((1L, 40L), (2L, 60L), (99L, 0L), (98L, 100L))
      .toDF("id", "s")
    val got = Retrieval.featureRerank(cand, Seq((f, "s", 1L)), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounds over candidates only: [40, 60] → 0 and 1e6
    assert(got.toSeq === Seq((2L, 1000000L), (1L, 0L)))
  }

  test("featureRerank: duplicate feature rows per id contract to max, " +
      "never double-count") {
    val cand = Seq(1L, 2L).toDF("id")
    // id 1 appears twice: an un-preaggregated frame must behave as
    // max(10, 50) = 50, not sum or bound-skewing duplicates
    val f = Seq((1L, 10L), (1L, 50L), (2L, 30L)).toDF("id", "s")
    val got = Retrieval.featureRerank(cand, Seq((f, "s", 1L)), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounds [30, 50]: id 1 → 1e6, id 2 → 0
    assert(got.toSeq === Seq((1L, 1000000L), (2L, 0L)))
  }

  test("mmrSelect: diversity penalty flips the second pick; trajectory is exact") {
    // A is the clear first pick; B is nearly as relevant but a
    // near-duplicate of A, C less relevant but orthogonal — MMR
    // (7/3) picks A, C, B; pure relevance would pick A, B, C
    val cand = Seq(
      (0L, 10L, 1000000L), (0L, 20L, 900000L), (0L, 30L, 800000L))
      .toDF("qid", "cid", "rel_micro")
    val ps = Seq(
      (0L, 10L, 20L, 1000000L), (0L, 20L, 10L, 1000000L),
      (0L, 10L, 30L, 0L), (0L, 30L, 10L, 0L),
      (0L, 20L, 30L, 0L), (0L, 30L, 20L, 0L))
      .toDF("qid", "a", "b", "sim_micro")
    val got = Retrieval.mmrSelect(cand, ps, k = 3).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    // pick 1: A, score 7·1e6; pick 2: C (7·8e5 − 0 = 5.6e6 beats B's
    // 7·9e5 − 3·1e6 = 3.3e6); pick 3: B
    assert(got.toSeq === Seq(
      (1L, 10L, 7000000L), (2L, 30L, 5600000L), (3L, 20L, 3300000L)))
  }

  test("mmrSelect with wDiv=0 equals top-k by pure relevance") {
    val cand = Seq(
      (0L, 1L, 500000L), (0L, 2L, 900000L), (0L, 3L, 700000L),
      (1L, 1L, 300000L), (1L, 2L, 100000L), (1L, 3L, 200000L))
      .toDF("qid", "cid", "rel_micro")
    val ps = Seq.empty[(Long, Long, Long, Long)]
      .toDF("qid", "a", "b", "sim_micro")
    val got = Retrieval.mmrSelect(cand, ps, k = 2, wRel = 1, wDiv = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    assert(got.toSeq === Seq(
      (0L, 1L, 2L), (0L, 2L, 3L), (1L, 1L, 1L), (1L, 2L, 3L)))
  }

  test("mmrSelect: duplicate candidate rows behave as their best copy; " +
      "a present NEGATIVE max-sim stands (no coalesce-to-zero)") {
    // cid 10 appears twice (rel 4e5 and 9e5): the unrolled argmax
    // picked the max-score duplicate, so the cogrouped form must score
    // it at rel 9e5. cid 20's only sim row to the pick is NEGATIVE:
    // penalty = wDiv * (-1e5) INCREASES its score above cid 30's.
    val cand = Seq(
      (0L, 10L, 400000L), (0L, 10L, 900000L),
      (0L, 20L, 500000L), (0L, 30L, 520000L))
      .toDF("qid", "cid", "rel_micro")
    val ps = Seq((0L, 20L, 10L, -100000L))
      .toDF("qid", "a", "b", "sim_micro")
    val got = Retrieval.mmrSelect(cand, ps, k = 2).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    // pick 1: cid 10 at 7*9e5; pick 2: cid 20 at 7*5e5 - 3*(-1e5) =
    // 3.8e6, beating cid 30's unpenalized 7*5.2e5 = 3.64e6
    assert(got.toSeq === Seq(
      (1L, 10L, 6300000L), (2L, 20L, 3800000L)))
  }

  test("mmrDiversify: first pick = top relevance; missing-embedding candidate " +
      "competes with similarity 0") {
    import org.apache.spark.sql.functions._
    // candidates 10 and 20 are embedded near-duplicates; candidate 99
    // has NO embedding row — it must still be selectable (sim 0 to
    // everything), and the near-dup of the first pick must lose to it
    val cand = Seq(
      (0L, 10L, 1000000L), (0L, 20L, 990000L), (0L, 99L, 600000L))
      .toDF("qid", "cid", "rel_micro")
    val emb = Seq(
      (10L, Array(1.0f, 0.0f)), (20L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.mmrDiversify(cand, emb, k = 3).collect()
      .map(r => (r.getLong(2), r.getLong(1)))
    // pick 1: cid 10 (rel argmax); pick 2: 99 — its unpenalized
    // 7·6e5 = 4.2e6 beats the near-dup 20's 7·9.9e5 − 3·1e6 = 3.93e6;
    // 20 takes pick 3
    assert(got.toSeq === Seq((1L, 10L), (2L, 99L), (3L, 20L)))
  }

  test("mmrTopK: k distinct picks per query; first pick = brute rank 1") {
    val emb = (0L until 10L).map { i =>
      val a = ((i * 37 + 11) % 17).toFloat / 17f
      val b = ((i * 53 + 5) % 19).toFloat / 19f
      val c = ((i * 71 + 3) % 23).toFloat / 23f
      (i, Array(a, b, c))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 2)
    val got = Retrieval.mmrTopK(emb, q, k = 3, r = 6)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 6)
    rows.groupBy(_._1).foreach { case (_, picks) =>
      assert(picks.map(_._2).distinct.length === 3)
      assert(picks.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    val brute1 = graft.ext.Similarity.bruteTopK(emb, q, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.filter(_._3 == 1L).foreach { case (qid, cid, _) =>
      assert(brute1(qid) === cid)
    }
  }

  test("hardNegatives: positives removed, ranks dense, shortlist order kept") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = (0L until 10L).map { i =>
      val a = ((i * 37 + 11) % 17).toFloat / 17f
      val b = ((i * 53 + 5) % 19).toFloat / 19f
      val c = ((i * 71 + 3) % 23).toFloat / 23f
      (i, Array(a, b, c))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 2)
    val short = graft.ext.Similarity.bruteTopK(emb, q, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // declare each query's top-2 shortlist members positives — the
    // mined set must be the NEXT candidates, re-numbered from 1
    val positives = short.filter(_._3 <= 2)
      .map(t => (t._1, t._2)).toSeq.toDF("qid", "cid")
    val got = Retrieval.hardNegatives(emb, q, positives, k = 3, depth = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.length === 6)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq === Seq(1, 2, 3))
      val want = short.filter(_._1 == qid).sortBy(_._3)
        .drop(2).take(3).map(_._2).toSeq
      assert(rows.sortBy(_._3).map(_._2).toSeq === want)
    }
  }

  test("maxSimTopK at m=1 over full width equals the plain cosine ranking") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val got = Retrieval.maxSimTopK(emb, q, k = 5, m = 1, subDim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val brute = graft.ext.Similarity.bruteTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq === brute.toSeq)
  }

  test("maxSimTopK: late interaction is part-order invariant, cosine is not") {
    import spark.implicits._
    // doc 10 is the query with its two halves SWAPPED: full-width
    // cosine 0, but every query part still finds a perfect partner
    // part (MaxSim 2.0 — the order-invariance that motivates late
    // interaction). doc 20 is a decent full-width match (cos ≈ 0.986,
    // MaxSim ≈ 1.973): plain cosine must rank 20 first, MaxSim 10.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f), 0),
      (10L, Array(0.0f, 1.0f, 1.0f, 0.0f), 0),
      (20L, Array(0.6f, 0.1f, 0.1f, 0.6f), 0))
      .toDF("vec_id", "embedding", "label")
    val q = emb.filter($"vec_id" === 0L)
    val plain = Retrieval.maxSimTopK(emb, q, k = 2, m = 1, subDim = 4)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    val late = Retrieval.maxSimTopK(emb, q, k = 2, m = 2, subDim = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    assert(plain(20L) === 1, "full-width cosine prefers the aligned doc")
    assert(late(10L) === 1,
      "MaxSim must prefer the doc whose parts all match under permutation")
  }

  test("spearmanStats: agreement 1.0, reversal -1.0, re-densified intersection") {
    import spark.implicits._
    val a = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val same = Retrieval.spearmanStats(a, a).collect().head
    assert(same.getLong(0) === 4L && same.getLong(1) === 0L)
    assert(same.getLong(2) === 1000000L)
    val rev = Seq((1L, 4), (2L, 3), (3L, 2), (4L, 1)).toDF("id", "rank")
    val opp = Retrieval.spearmanStats(a, rev).collect().head
    assert(opp.getLong(2) === -1000000L)
    // intersection + re-densify: b ranks only {2,4} plus strangers —
    // within the common ids the ORDER agrees, so rho is 1.0 even
    // though raw rank values differ wildly
    val b = Seq((2L, 7), (4L, 9), (99L, 1), (98L, 2)).toDF("id", "rank")
    val sub = Retrieval.spearmanStats(a, b).collect().head
    assert(sub.getLong(0) === 2L && sub.getLong(2) === 1000000L)
  }
}
