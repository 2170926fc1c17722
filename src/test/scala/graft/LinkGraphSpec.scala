package graft

import org.apache.spark.sql.functions._

import graft.ext.LinkGraph

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank one iteration matches the hand-computed integer trajectory") {
    // 1 → 2 → 3, node 3 dangling; N = 3, rank0 = 333333 each
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = LinkGraph.pageRank(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base = 150000 // 3 = 50000; dangling share = 333333 // 3 = 111111
    // r(1) = 50000 + 850000 * 111111            // 1e6 = 144444
    // r(2) = 50000 + 850000 * (333333 + 111111) // 1e6 = 427777
    // r(3) = r(2) (same single inflow)
    assert(got === Map(1L -> 144444L, 2L -> 427777L, 3L -> 427777L))
  }

  test("inLinkStats counts parallel edges and breaks argmax ties low") {
    // node 10: src 1 twice + src 2 once → top_src 1 by count;
    // node 20: srcs 2 and 3 tie at one link each → smaller src wins
    val edges = Seq((1L, 10L), (1L, 10L), (2L, 10L), (3L, 20L), (2L, 20L))
      .toDF("src", "dst")
    val got = LinkGraph.inLinkStats(edges).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got(0) === ((10L, 3L, 2L, 1L, 2L)))
    assert(got(1) === ((20L, 2L, 2L, 2L, 1L)))
  }

  test("pageRank concentrates rank on the sink and stays mass-bounded") {
    // star: everyone links to node 0, node 0 links back to 1
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
      .union(Seq((0L, 1L)).toDF("src", "dst"))
    val got = LinkGraph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === got.values.max)     // the hub dominates
    assert(got(1L) > got(2L))              // the hub's target beats leaves
    // integer mass only ever decays (floor divisions), never inflates
    assert(got.values.sum <= 1000000L)
    assert(got.values.forall(_ > 0L))
  }

  test("syntheticEdges drops self-loops and mods into the id range") {
    val docs = (0L until 100L).toDF("doc_id")
    val e = LinkGraph.syntheticEdges(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.forall { case (s, d) => s != d && d >= 0 && d < 100 })
    assert(!e.exists(_._1 == 0L)) // 0 % 97 == 0 → dangling by design
    assert(!e.exists(_._1 == 97L))
  }

  test("triangleCensus: known graph, direction/multiplicity-blind, exact wedges") {
    // triangle {1,2,3} + pendant 3-4; reversed and duplicate edges must
    // not change anything
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = LinkGraph.triangleCensus(edges).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 4L)
    // deg = (2,2,3,1) → wedges 1+1+3+0 = 5
    assert(r.getAs[Long]("n_wedges") === 5L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    // transitivity = 3·1/5 = 0.6
    assert(r.getAs[Long]("transitivity_micro") === 600000L)
    assert(r.getAs[Long]("n_capped_nodes") === 0L)
  }

  test("triangleCensus: triangle-free star has wedges but zero transitivity") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = LinkGraph.triangleCensus(star).collect().head
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Long]("transitivity_micro") === 0L)
    assert(r.getAs[Long]("n_capped_nodes") === 0L)
  }

  test("triangleCensus: a firing wedge cap is visible in n_capped_nodes") {
    // triangle {1,2,3}: node 1's oriented out-degree is 2 (1-2, 1-3),
    // so maxWedgeDegree = 1 skip-lists it — the triangle's only wedge
    // a<b<c disappears and the cap must SAY so
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val exact = LinkGraph.triangleCensus(edges).collect().head
    assert(exact.getAs[Long]("n_triangles") === 1L)
    assert(exact.getAs[Long]("n_capped_nodes") === 0L)
    val capped = LinkGraph.triangleCensus(edges, maxWedgeDegree = 1)
      .collect().head
    assert(capped.getAs[Long]("n_capped_nodes") === 1L)
    assert(capped.getAs[Long]("n_triangles") === 0L)
    // n_wedges stays the full degree sum — capped transitivity is a
    // visible LOWER bound, not a silently rescaled ratio
    assert(capped.getAs[Long]("n_wedges") === 3L)
  }
}
