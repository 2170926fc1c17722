package graft

import org.apache.spark.sql.functions._

import graft.ops.RuntimeFilters

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin is row-identical to the plain inner join") {
    val fact = (1L to 1000L).map(i => (i % 97, i)).toDF("fk", "payload")
    val dim = Seq((3L, "a"), (11L, "b"), (42L, "c"), (96L, "d"))
      .toDF("dk", "attr")
    val pruned = RuntimeFilters.bloomPrunedJoin(fact, dim, "fk", "dk")
      .select("fk", "payload", "dk", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "dk", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2))
    assert(pruned.nonEmpty, "join must produce rows")
    assert(pruned.toSeq === plain.toSeq)
  }

  test("prunedByBloom keeps every true match and actually prunes") {
    val fact = (1L to 10000L).toDF("k")
    // sparse dim: 100 of 10000 keys
    val dim = (1L to 10000L by 100).toDF("dk")
    val bloom = RuntimeFilters.keyBloom(dim, "dk")
    val kept = RuntimeFilters.prunedByBloom(fact, bloom, "k")
    val keptKeys = kept.collect().map(_.getLong(0)).toSet
    val dimKeys = dim.collect().map(_.getLong(0)).toSet
    // no false negatives: every dim key survives the prefilter
    assert(dimKeys.subsetOf(keptKeys), "bloom dropped a true match")
    // pruning is real: at 8.4 bits/key the fpp is ~3%, so far fewer
    // than half of the 9900 non-matching keys may survive
    assert(keptKeys.size < 5000,
      s"bloom pruned nothing (${keptKeys.size} of 10000 kept)")
  }

  test("the prefilter plans as a scalar subquery, not a join") {
    val fact = (1L to 100L).toDF("k")
    val dim = Seq(1L, 2L).toDF("dk")
    val pruned = RuntimeFilters.prunedByBloom(
      fact, RuntimeFilters.keyBloom(dim, "dk"), "k")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan)
    // the probe side must NOT pay a join for the bloom attachment
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("empty build side yields an empty (not failing) pruned join") {
    val fact = (1L to 50L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    val out = RuntimeFilters.bloomPrunedJoin(fact, dim, "k", "dk")
    assert(out.count() === 0L)
  }
}
