package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.stream.AssetDedupStream

/** Streaming perceptual asset dedup — batch parity with the q305 gate,
  * incremental store matching, and restart idempotency. */
class AssetDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0 until 610)
    .map(i => ('a' + (i * 7 + i / 13) % 26).toChar).mkString
  private val corrupted = base.substring(0, 100) + "ZZZZZ" + base.substring(105)
  private val other = (0 until 400)
    .map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString

  private def assetsOf(rows: Seq[(Long, String)]): DataFrame =
    Multimodal.assets(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("payload"))

  private def outOf(dir: String): Map[Long, (String, Option[Long])] =
    spark.read.option("basePath", s"$dir/out").parquet(s"$dir/out")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("single drained batch flags exactly the q305 pair structure " +
      "(first-copy, nearest neighbour)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_assetdedup").toString
    val rows = Seq((1L, base), (2L, base), (3L, other), (4L, other),
      (5L, corrupted))
    AssetDedupStream.processBatch(s"$dir/store", s"$dir/out")(
      assetsOf(rows), 0L)
    val got = outOf(dir)
    // exact copies dup their smaller twin; the corrupted variant's
    // nearest neighbours are the (identical) 1/2 — min id wins
    assert(got(1L) === (("kept", None)))
    assert(got(2L) === (("duplicate", Some(1L))))
    assert(got(3L) === (("kept", None)))
    assert(got(4L) === (("duplicate", Some(3L))))
    assert(got(5L)._1 === "duplicate" && got(5L)._2 === Some(1L))
    // parity: every flagged (doc, dup_of) is a q305 pair of this frame
    val pairs = Multimodal.phashPairs(
        Multimodal.assets(rows.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.collect { case (id, ("duplicate", Some(of))) => (of, id) }
      .foreach(p => assert(pairs.contains(p), s"$p not a q305 pair"))
    // store holds ONLY the kept assets (4 banded rows each)
    val stored = spark.read.option("basePath", s"$dir/store")
      .parquet(s"$dir/store").select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stored === Set(1L, 3L))
  }

  test("a later re-encoded copy is flagged against the STORE; " +
      "redelivery recomputes identical decisions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_assetdedup2").toString
    AssetDedupStream.processBatch(s"$dir/store", s"$dir/out")(
      assetsOf(Seq((1L, base))), 0L)
    AssetDedupStream.processBatch(s"$dir/store", s"$dir/out")(
      assetsOf(Seq((5L, corrupted), (6L, other))), 1L)
    val got = outOf(dir)
    assert(got(1L) === (("kept", None)))
    assert(got(5L)._1 === "duplicate" && got(5L)._2 === Some(1L))
    assert(got(6L) === (("kept", None)))
    // redelivered batch 1: store-minus-own-partition makes the rerun
    // see the same world -> byte-identical decision set
    AssetDedupStream.processBatch(s"$dir/store", s"$dir/out")(
      assetsOf(Seq((5L, corrupted), (6L, other))), 1L)
    assert(outOf(dir) === got)
    val stored = spark.read.option("basePath", s"$dir/store")
      .parquet(s"$dir/store").select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stored === Set(1L, 6L))
  }

  test("end-to-end stream drain via sinkAvailableNow") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_assetdedup3").toString
    val stream = MemoryStream[(Long, String)](spark)
    val docs = Multimodal.assets(
        stream.toDF().toDF("doc_id", "text"))
      .select(col("doc_id"), col("payload"))
    stream.addData((1L, base), (5L, corrupted))
    val q = AssetDedupStream.sinkAvailableNow(docs,
      s"$dir/store", s"$dir/out", s"$dir/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val got = outOf(dir)
    assert(got(1L) === (("kept", None)))
    assert(got(5L)._1 === "duplicate" && got(5L)._2 === Some(1L))
  }
}
