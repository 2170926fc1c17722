package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, TextAnalysis => T}
import graft.ops.Aggregations

/** Round-5 training-pipeline operators: shard manifest, BM25 retrieval,
  * duplicated-gram coverage, Zipf slope, snapshot diff, winsorization. */
class TrainingOpsSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("documents")).localCheckpoint()

  test("trainShards: total docs preserved, shards bounded, deterministic") {
    val m1 = Curation.trainShards(docs, nShards = 8, seed = 42L)
      .orderBy(col("shard")).collect()
    val m2 = Curation.trainShards(docs, nShards = 8, seed = 42L)
      .orderBy(col("shard")).collect()
    assert(m1.toSeq == m2.toSeq, "shard manifest must be run-stable")
    assert(m1.map(_.getLong(1)).sum == docs.count())
    assert(m1.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
    // a different seed must produce a different assignment
    val m3 = Curation.trainShards(docs, nShards = 8, seed = 43L)
      .orderBy(col("shard")).collect()
    assert(m1.map(_.getLong(3)).toSeq != m3.map(_.getLong(3)).toSeq)
  }

  test("bm25TopK: term hits rank above non-hits, tf monotone, dl penalized") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark engine"),          // high tf, short
      (2L, "spark engine engine engine"),        // tf 1, short
      (3L, "engine engine engine engine"),       // no hit
      (4L, "spark spark spark engine engine engine engine engine") // high tf, long
    ).toDF("doc_id", "text")
    val got = T.bm25TopK(corpus, terms = Seq("spark"), k = 10).collect()
    val ids = got.map(_.getLong(0)).toSeq
    assert(!ids.contains(3L), "doc without any query term must not score")
    assert(ids.head == 1L, "highest tf + shortest doc wins")
    val score = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(score(1L) > score(4L), "same tf, longer doc scores lower")
    assert(score(4L) > score(2L), "higher tf beats lower tf at this length gap")
  }

  test("dupGramCoverage: shared trigrams counted, short docs get zero grams") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d"),     // grams: "a b c", "b c d"
      (2L, "a b c x"),     // grams: "a b c", "b c x"
      (3L, "z q"),         // too short: 0 grams
      (4L, "p q r s")      // grams unique to doc 4
    ).toDF("doc_id", "text")
    val got = T.dupGramCoverage(corpus, n = 3, minDocs = 2)
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0.0)))
  }

  test("zipfSlope: an exact power-law corpus fits slope -1") {
    import spark.implicits._
    // freq(token_r) = 720/r for r in 1..6 — exact Zipf, slope must be -1
    val text = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"t$r")).mkString(" ")
    val corpus = Seq((1L, "x", text)).toDF("doc_id", "lang", "text")
    val got = T.zipfSlope(corpus, topN = 6).collect()
    assert(got.length == 1)
    val slope = got.head.getAs[Double]("zipf_slope")
    assert(math.abs(slope - (-1.0)) < 1e-4, s"slope was $slope")
  }

  test("snapshotDiff: added/removed/changed/unchanged partition the id space") {
    import spark.implicits._
    val cur = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val prev = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(cur, prev)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("syntheticPrevSnapshot diff statuses match the arithmetic fixture") {
    val diff = Curation.snapshotDiff(docs, Curation.syntheticPrevSnapshot(docs))
    val byStatus = diff.groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    assert(byStatus("added") == ids.count(_ % 7 == 0))
    assert(byStatus("removed") == ids.count(_ % 11 == 0))
    assert(byStatus("changed") == ids.count(i => i % 7 != 0 && i % 5 == 0))
    assert(byStatus.values.sum == n + ids.count(_ % 11 == 0))
  }

  test("splitLeakage flags exactly the components spanning ≥2 splits") {
    import spark.implicits._
    val ids = (1L to 40L)
    val comps = ids.map(i => (i, i % 8)).toDF("doc_id", "component")
    // replicate the split assignment to derive the expected leaky set
    val splits = T.withHashSplit(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = ids.groupBy(_ % 8)
      .filter { case (_, ms) => ms.map(splits).toSet.size >= 2 }
      .keySet
    val got = graft.ext.Dedup.splitLeakage(comps).collect()
    assert(got.map(_.getLong(0)).toSet == expected)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4))
    }
  }

  test("weightedSample: salted two-phase top-k equals the direct rank") {
    import org.apache.spark.sql.expressions.Window
    val got = Curation.weightedSample(docs, k = 5, seed = 7L, salt = 4)
      .orderBy(col("lang"), col("rk")).collect()
    // direct unsalted reference rank over the same quantized key
    val h = T.md5Hash60(concat(lit("7:"), col("doc_id").cast("string")))
    val keyed = docs.select(col("lang"), col("doc_id"),
      round(log((h + lit(1L)).cast("double") / lit(1.152921504606846976e18))
        / greatest(length(col("text")).cast("double"), lit(1.0)) * 1e6, 0)
        .cast("long").as("key_micro"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("key_micro").desc, col("doc_id"))
    val want = keyed.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("key_micro"))
      .orderBy(col("lang"), col("rk")).collect()
    assert(got.toSeq == want.toSeq)
    // reproducible; different seed draws a different sample
    val again = Curation.weightedSample(docs, k = 5, seed = 7L, salt = 4)
      .orderBy(col("lang"), col("rk")).collect()
    assert(got.toSeq == again.toSeq)
    val other = Curation.weightedSample(docs, k = 5, seed = 8L, salt = 4)
      .orderBy(col("lang"), col("rk")).collect()
    assert(got.map(_.getLong(2)).toSeq != other.map(_.getLong(2)).toSeq)
  }

  test("repairSplitLeakage: components re-split as units, others untouched") {
    val comps = graft.ext.Dedup.components(
      graft.ext.Dedup.coShinglePairs(docs, minShared = 2,
        maxPostings = 1000)).localCheckpoint()
    val repaired = graft.ext.Dedup.repairSplitLeakage(docs, comps)
    assert(repaired.count() == docs.count())
    // after repair no component spans two splits
    val spans = repaired.join(comps, "doc_id")
      .groupBy(col("component"))
      .agg(countDistinct(col("repaired_split")).as("k"))
      .filter(col("k") > 1).count()
    assert(spans == 0L, "a repaired component still spans splits")
    // docs outside any component keep their id-hash split
    val touched = repaired.join(comps, Seq("doc_id"), "left_anti")
      .filter(col("split") =!= col("repaired_split")).count()
    assert(touched == 0L, "a non-component doc was moved")
  }

  test("hardNegatives: cross-label only, ranked, bounded at k") {
    val emb = spark.read.parquet(sf("embeddings")).localCheckpoint()
    val got = graft.ext.Similarity.hardNegatives(emb, k = 3)
      .localCheckpoint()
    assert(got.count() > 0)
    assert(got.filter(col("rk") > 3).count() == 0L)
    val labels = emb.select(col("vec_id").as("nid"), col("label").as("nlbl"))
    val sameLabel = got
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .join(labels, col("neg_id") === col("nid"))
      .filter(col("label") === col("nlbl")).count()
    assert(sameLabel == 0L, "a negative shares the anchor's label")
    // rk is dense from 1 within each anchor
    val badRk = got.groupBy(col("vec_id"))
      .agg(max(col("rk")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRk == 0L)
  }

  test("winsorizeStats matches a brute-force discrete-percentile clamp") {
    import spark.implicits._
    val vals = Seq.tabulate(200)(i => ("g", (i + 1).toLong)) ++
      Seq(("g", 100000L), ("h", 5L), ("h", 6L), ("h", 7L))
    val df = vals.toDF("grp", "v")
    val got = Aggregations.winsorizeStats(df, "grp", "v")
      .orderBy(col("grp")).collect()
    // brute force for group g: 201 values, lo = smallest v with
    // 100*cum >= 5*201 (cum >= 10.05 -> 11th value = 11),
    // hi: cum >= 190.95 -> 191st value = 191
    val g = got.find(_.getString(0) == "g").get
    assert(g.getLong(2) == 11L && g.getLong(3) == 191L)
    assert(g.getLong(4) == 10L, "10 values below lo clamp")
    assert(g.getLong(5) == 10L, "9 above 191 plus the outlier")
    // 1..10 clamp to 11 (plus 11 itself = 11×11), 12..190 untouched,
    // 191 itself plus the 10 clamped-down values = 11×191
    val expectedSum = 11L * 11 + (12L to 190L).sum + 11L * 191
    assert(g.getLong(6) == expectedSum)
    val h = got.find(_.getString(0) == "h").get
    assert(h.getLong(2) == 5L && h.getLong(3) == 7L)
    assert(h.getLong(4) == 0L && h.getLong(5) == 0L)
    assert(h.getLong(6) == 18L)
  }
}
