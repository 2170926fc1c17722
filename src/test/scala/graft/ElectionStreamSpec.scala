package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.stream.ElectionStream

/** The streaming keep-best election (the q254 election's incremental
  * twin) — parity with the batch election, the upgrade/demotion
  * contract, and restart idempotency. */
class ElectionStreamSpec extends SparkSpec {
  import spark.implicits._

  // (id, cluster key, pref) — three clusters; cluster "b"'s best copy
  // (id 20, pref 9) arrives in a LATER batch than its worse copy
  private val docsAll = Seq(
    (1L, "a", 5L), (2L, "a", 7L), (3L, "b", 4L),
    (10L, "c", 2L), (20L, "b", 9L), (21L, "a", 7L))

  private def df(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("doc_id", "k_src", "pref_src")

  private val keyCol = (d: DataFrame) => d("k_src")
  private val prefCol = (d: DataFrame) => d("pref_src")

  private def run(dir: String, batches: Seq[Seq[(Long, String, Long)]]): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      ElectionStream.processElectBatch(keyCol, prefCol,
        s"$dir/store", s"$dir/out")(df(rows), i.toLong)
    }

  private def reps(dir: String): Map[String, (Long, Long)] =
    ElectionStream.bestPerKey(
      spark.read.option("basePath", s"$dir/store")
        .parquet(s"$dir/store").select("k", "id", "pref"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap

  test("batch-at-a-time fold equals the batch election (monoid parity)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    // three arbitrary batch cuts of the same corpus
    run(dir, Seq(docsAll.take(3), docsAll.slice(3, 5), docsAll.drop(5)))
    // batch twin: per-key argmax by (pref DESC, id ASC)
    val want = docsAll.groupBy(_._2).map { case (k, rows) =>
      val best = rows.minBy(r => (-r._3, r._1))
      k -> (best._1, best._3)
    }
    assert(reps(dir) === want)
    // a: id 2 beats the equal-pref id 21 (id tie-break); b: the late
    // better copy 20 beats 3; c: singleton 10
    assert(reps(dir) === Map("a" -> (2L, 7L), "b" -> (20L, 9L),
      "c" -> (10L, 2L)))
  }

  test("a later better copy emits kept + a demotion of the prior best") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    run(dir, Seq(docsAll.take(3), docsAll.slice(3, 5), docsAll.drop(5)))
    val out = spark.read.option("basePath", s"$dir/out")
      .parquet(s"$dir/out")
      // the partition column infers as int; pin it
      .select(col("id"), col("status"), col("demotes"),
        col("batch_id").cast("long").as("batch_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.toString.toLong),
          r.getLong(3))).toMap
    // batch 0: 1/2/3 all first of their (key or batch rank)
    assert(out(2L) === (("kept", None, 0L))) // wins "a" in-batch
    assert(out(1L) === (("duplicate", None, 0L)))
    assert(out(3L) === (("kept", None, 0L)))
    // batch 1: 20 UPGRADES "b" — kept, demoting 3; 10 is fresh
    assert(out(20L) === (("kept", Some(3L), 1L)))
    assert(out(10L) === (("kept", None, 1L)))
    // batch 2: 21 ties id 2 on pref but loses the id tie-break
    assert(out(21L) === (("duplicate", None, 2L)))
  }

  test("redelivered batch recomputes the identical decisions (idempotency)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    run(dir, Seq(docsAll.take(3), docsAll.slice(3, 5), docsAll.drop(5)))
    val before = reps(dir)
    val outBefore = spark.read.option("basePath", s"$dir/out")
      .parquet(s"$dir/out/batch_id=1").collect().toSet
    // crash-redeliver batch 1 (store already holds its partition)
    ElectionStream.processElectBatch(keyCol, prefCol,
      s"$dir/store", s"$dir/out")(df(docsAll.slice(3, 5)), 1L)
    assert(reps(dir) === before)
    assert(spark.read.option("basePath", s"$dir/out")
      .parquet(s"$dir/out/batch_id=1").collect().toSet === outBefore)
  }

  test("end-to-end stream run matches the per-batch contract") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    val stream = MemoryStream[(Long, String, Long)](spark)
    val q = ElectionStream.sinkElected(
      stream.toDF().toDF("doc_id", "k_src", "pref_src"),
      keyCol, prefCol, s"$dir/store", s"$dir/out", s"$dir/ckpt").start()
    stream.addData(docsAll.take(3): _*)
    q.processAllAvailable()
    stream.addData(docsAll.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val want = docsAll.groupBy(_._2).map { case (k, rows) =>
      val best = rows.minBy(r => (-r._3, r._1))
      k -> (best._1, best._3)
    }
    assert(reps(dir) === want)
  }

  test("snapshotDiff feeds the election: added + grown docs upgrade, " +
      "demotions point at the superseded rep") {
    import graft.ext.Curation
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    // crawl 1: two clusters
    val prev = Seq((1L, "k1", "short"), (2L, "k1", "longer text"),
      (3L, "k2", "medium len"))
      .toDF("doc_id", "k_src", "text")
      .withColumn("pref_src", length(col("text")).cast("long"))
    ElectionStream.processElectBatch(keyCol,
      d => length(d("text")).cast("long"),
      s"$dir/store", s"$dir/out")(prev, 0L)
    assert(reps(dir) === Map("k1" -> (2L, 11L), "k2" -> (3L, 10L)))

    // crawl 2: doc 1 GREW past doc 2; doc 9 is new
    val cur = Seq((1L, "k1", "short but now much much longer"),
      (2L, "k1", "longer text"), (3L, "k2", "medium len"),
      (9L, "k3", "fresh"))
      .toDF("doc_id", "k_src", "text")
    // only added/changed docs re-enter the pipeline (the snapshotDiff
    // contract) — unchanged docs never re-elect
    val delta = Curation.snapshotDiff(cur, prev.drop("pref_src"))
      .filter(col("status").isin("added", "changed"))
      .join(cur, Seq("doc_id"))
      .select(col("doc_id"), col("k_src"), col("text"))
    assert(delta.count() === 2L) // docs 1 and 9 only
    ElectionStream.processElectBatch(keyCol,
      d => length(d("text")).cast("long"),
      s"$dir/store", s"$dir/out")(delta, 1L)
    // doc 1's grown copy upgrades k1 (demoting 2); k3 is fresh
    assert(reps(dir) === Map("k1" -> (1L, 30L), "k2" -> (3L, 10L),
      "k3" -> (9L, 5L)))
    val d1 = spark.read.parquet(s"$dir/out/batch_id=1")
      .filter(col("id") === 1L).collect()(0)
    assert(d1.getAs[String]("status") === "kept")
    assert(d1.getAs[Long]("demotes") === 2L)
  }

  test("applyTombstones: a deleted rep falls back to the best " +
      "surviving APPENDED copy (log-layout limitation honored)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_elect").toString
    run(dir, Seq(docsAll.take(3), docsAll.slice(3, 5), docsAll.drop(5)))
    // appended log: (a,2,7), (b,3,4), (c,10,2), (b,20,9) — the
    // in-batch loser 1 and the tie-loser 21 were never appended
    val store = spark.read.option("basePath", s"$dir/store")
      .parquet(s"$dir/store").select("k", "id", "pref")
    // delete the current best of "b" (20): the log still holds 3
    val after = ElectionStream.applyTombstones(store,
      Seq(20L).toDF("id"))
      .select("k", "id", "pref")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(after("b") === ((3L, 4L)), "fallback to surviving log row")
    assert(after("a") === ((2L, 7L)) && after("c") === ((10L, 2L)))
    // delete every appended copy of a key: it vanishes entirely
    val gone = ElectionStream.applyTombstones(store,
      Seq(20L, 3L).toDF("id"))
      .select("k").collect().map(_.getString(0)).toSet
    assert(gone === Set("a", "c"))
  }

  test("erasureReElectStats: rep deletion re-elects or empties per " +
      "component") {
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "web", 50L), (2L, "web", 90L), (3L, "books", 90L), // cluster
      (4L, "web", 10L),                                       // singleton
      (10L, "web", 30L), (11L, "web", 30L))                   // tie cluster
      .toDF("doc_id", "source", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "component")
    // delete rep 2 (cluster re-elects 3), singleton 4 (empties), and
    // non-rep 11 (no rep change)
    val got = Dedup.erasureReElectStats(docs, comps,
        Seq(2L, 4L, 11L).toDF("doc_id"), prefCol = col("n_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // original reps: 2 (web), 4 (web), 10 (web) — all sources "web"
    assert(got.keySet === Set("web"))
    val (nc, del, re, emp) = got("web")
    assert(nc === 3L)   // 3 components
    assert(del === 2L)  // reps 2 and 4 deleted
    assert(re === 1L)   // cluster {1,2,3} re-elects 3
    assert(emp === 1L)  // singleton 4 empties
  }

  test("logErasureDivergence: log and exact re-election legitimately " +
      "diverge when the erased best arrived before the runner-up") {
    // the audit batches by md5("eb:"+id) % 5 — probe the assignment so
    // the fixture can place the best BEFORE the runner-up (divergence)
    // and AFTER it (agreement) deterministically
    val batchOf = (1L to 40L).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"eb:$i".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      i -> java.lang.Long.parseLong(hex, 16) % 5
    }.toMap
    val Some((iBest, jLate)) = (for {
      i <- 1L to 40L; j <- 1L to 40L
      if i != j && batchOf(i) < batchOf(j)
    } yield (i, j)).headOption
    val Some((kBest, lEarly)) = (for {
      k <- 1L to 40L; l <- 1L to 40L
      if k != l && Set(k, l).intersect(Set(iBest, jLate)).isEmpty &&
        batchOf(k) > batchOf(l)
    } yield (k, l)).headOption
    val docs = Seq(
      (iBest, "s", 100L), (jLate, "s", 50L),  // best first -> j never appended
      (kBest, "t", 100L), (lEarly, "t", 50L)) // best later  -> l appended
      .toDF("doc_id", "source", "pref")
    val comps = Seq((iBest, 1L), (jLate, 1L), (kBest, 2L), (lEarly, 2L))
      .toDF("doc_id", "component")
    val got = ElectionStream.logErasureDivergence(docs, comps,
        Seq(iBest, kBest).toDF("doc_id"), prefCol = col("pref"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cluster "s": best erased, runner-up was suppressed by it and
    // never appended -> exact serves jLate, the log serves NOTHING
    assert(got("s") === ((1L, 1L, 1L)))
    // cluster "t": best arrived after the runner-up, so the runner-up
    // IS in the log -> both layouts agree after the erasure
    assert(got("t") === ((1L, 0L, 0L)))
  }

  test("electMergeParityStats witnesses the monoid (n_disagree = 0)") {
    val docs = docsAll.map { case (id, k, p) =>
      (id, k, p, s"src${id % 3}") }
      .toDF("doc_id", "k_src", "pref_src", "source")
    val stats = Dedup.electMergeParityStats(docs,
      keyCol = col("k_src"), prefCol = col("pref_src"),
      splitCol = pmod(col("doc_id"), lit(2L)))
    val rows = stats.collect()
    assert(rows.map(_.getLong(1)).sum === 3L) // three keys
    assert(rows.map(_.getLong(3)).sum === 0L) // no disagreement
    assert(rows.map(_.getLong(2)).sum === 3L) // all agree
  }
}
