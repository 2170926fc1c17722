package graft

import org.apache.spark.sql.functions._

import graft.ext.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // a dirty merchant-name column: typos within 2 edits, a chain whose
  // endpoints exceed the threshold, an unrelated name, and a stopword
  // token ("store") shared by everything
  private lazy val rows = Seq(
    (1L, "acme anvil store"),
    (2L, "acme anvyl store"),   // 1 edit from #1
    (3L, "acme anvyls store"),  // 1 edit from #2, 2 from #1
    (4L, "acme anvyls strore"), // chain: 3+ edits from #1
    (5L, "zenith rocket store"),
    (6L, "acme anvil store"))   // exact dup of #1
    .toDF("id", "name")

  test("fuzzyNameMatches: token-blocked pairs, exact Levenshtein verify") {
    val got = Linkage.fuzzyNameMatches(rows, maxDist = 2, nameCol = "name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // exact dups collapse in the distinct domain, so no dist-0 row;
    // zenith never matches anything
    assert(got.forall { case (a, b, d) => a < b && d >= 1 && d <= 2 })
    assert(!got.exists(t => t._1.startsWith("zenith") || t._2.startsWith("zenith")))
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains(("acme anvil store", "acme anvyl store")))
    assert(pairs.contains(("acme anvyl store", "acme anvyls store")))
    // chain endpoint beyond maxDist is NOT a direct match
    assert(!pairs.contains(("acme anvil store", "acme anvyls strore")))
  }

  test("canonicalizeNames: transitive closure re-keys the whole chain") {
    val matches = Linkage.fuzzyNameMatches(rows, maxDist = 2, nameCol = "name")
    val got = Linkage.canonicalizeNames(rows, matches, nameCol = "name")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // the whole acme chain — including the endpoint 4 reachable only
    // transitively — canonicalizes to the lexicographic min
    Seq(1L, 2L, 3L, 4L, 6L).foreach { id =>
      assert(got(id) === "acme anvil store", s"id $id")
    }
    // unmatched names canonicalize to themselves
    assert(got(5L) === "zenith rocket store")
  }

  test("fuzzyNameMatches drops over-df blocking tokens") {
    // with maxDf = 1, every token ("acme", "store") is over the cap —
    // no candidates survive blocking
    val got = Linkage.fuzzyNameMatches(rows, maxDist = 2,
      nameCol = "name", maxDf = 1)
    assert(got.isEmpty)
  }
}
