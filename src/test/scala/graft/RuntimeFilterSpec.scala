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
    val bloom = RuntimeFilters.keyBloom(dim, "dk", 1000000L, 8388608L)
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
      fact, RuntimeFilters.keyBloom(dim, "dk", 1000000L, 8388608L), "k")
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

  test("one bloom frame attached to two predicates of one query is " +
      "safe (fresh subquery expression per attachment)") {
    val fact = (1L to 2000L).map(i => (i % 97, i % 89)).toDF("k1", "k2")
    val dim = Seq(3L, 11L, 42L).toDF("dk")
    val bloom = RuntimeFilters.keyBloom(dim, "dk", 1000000L, 8388608L)
    val both = fact.where(
      RuntimeFilters.mightContainKey(bloom, col("k1")) &&
        RuntimeFilters.mightContainKey(bloom, col("k2")))
    val keys = Set(3L, 11L, 42L)
    val got = both.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => keys(p._1) && keys(p._2)).toSet
    // no false negatives on either predicate
    assert(want.subsetOf(got), "double-attached bloom dropped a match")
    assert(got.nonEmpty)
    // both predicates survived to the physical plan
    val plan = both.queryExecution.executedPlan.toString
    assert("might_contain".r.findAllIn(plan).size >= 2, plan)
  }

  test("adaptive sizing derives bits from the build side and stays " +
      "row-identical to the plain join") {
    val fact = (1L to 5000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L until 500L by 5).toDF("dk")
    val (n, bits) = RuntimeFilters.adaptiveBloomSizing(dim, "dk")
    assert(n === 100L)
    assert(bits === 800L)
    val pruned = RuntimeFilters
      .bloomPrunedJoin(fact, dim, "fk", "dk")
      .select("fk", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pruned.nonEmpty && pruned === plain)
  }

  test("bloomPrunedSkewJoin: row-identical to the plain join, bloom " +
      "filter present, salt columns dropped") {
    val fact = (1L to 3000L).map(i => (i % 97, i)).toDF("fk", "payload")
    val dim = Seq((3L, "a"), (11L, "b"), (42L, "c")).toDF("dk", "attr")
    val skewed = RuntimeFilters.bloomPrunedSkewJoin(
      fact, dim, "fk", "dk", salt = 4)
    val got = skewed.select("fk", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(got.nonEmpty && got === want)
    assert(!skewed.columns.contains("_salt"))
    val plan = skewed.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("observedFpp: exact counts, fpp near design under adaptive " +
      "sizing, saturation surfaces in design_fpp") {
    val fact = (1L to 20000L).toDF("k")
    val dim = (1L to 20000L by 100).toDF("dk") // 200 keys
    val r = RuntimeFilters.observedFpp(fact, dim, "k", "dk").collect()(0)
    assert(r.getLong(0) === 20000L) // n_fact
    assert(r.getLong(1) === 200L)   // n_match
    assert(r.getLong(2) === 19800L) // n_nonmatch
    val observed = r.getLong(4)
    val design = r.getLong(5)
    assert(design > 0L && design < 100000L,
      s"adaptive sizing should land near 2-3% design fpp, got $design")
    assert(observed <= 2L * math.max(design, 1000L),
      s"observed fpp $observed blew past design $design")
    // saturation: 200 keys forced into 64 bits — the design fpp itself
    // goes to ~1, which is what the q191 gate turns red on
    val sat = RuntimeFilters
      .observedFpp(fact, dim, "k", "dk", bitsPerKey = 8, maxBits = 64L)
      .collect()(0)
    assert(sat.getLong(5) > 500000L,
      s"saturated design fpp should exceed 50%, got ${sat.getLong(5)}")
    assert(sat.getLong(4) > 500000L,
      s"saturated observed fpp should exceed 50%, got ${sat.getLong(4)}")
  }
}
