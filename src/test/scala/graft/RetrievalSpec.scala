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
}
