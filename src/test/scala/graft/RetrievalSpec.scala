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
}
