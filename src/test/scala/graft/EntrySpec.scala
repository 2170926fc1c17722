package graft

/** Driver-contract regression: every registered query executes on the
  * smoke-scale fixture and returns rows; every oracle key has a query.
  */
class EntrySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned no rows")
    }
  }

  // q21 broadcasts the tiny query set against the corpus (the exact
  // brute-force baseline is a nested loop by definition) and q34
  // broadcasts its 16-row centroid set — every other plan must be free
  // of nested-loop joins, and nothing may plan a cartesian product
  private val allowedNestedLoop = Set("q21_ann_brute", "q34_ann_ivf")

  test("no query plans a cartesian product; nested-loop joins only where intended") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin") &&
        !allowedNestedLoop(name)
      if (cartesian || nlj)
        Some(s"$name${if (cartesian) " [cartesian]" else ""}" +
          s"${if (nlj) " [nested-loop]" else ""}")
      else None
    }
    assert(offenders.isEmpty, s"plan-quality offenders: $offenders")
  }
}
