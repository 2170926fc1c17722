package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.stream.VectorIngest

class VectorIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Array[Float] = Array(
    ((i * 37 + 11) % 17).toFloat / 17f,
    ((i * 53 + 5) % 19).toFloat / 19f,
    ((i * 71 + 3) % 23).toFloat / 23f,
    ((i * 89 + 7) % 29).toFloat / 29f)

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  test("streaming ingest equals the batch add twin; dups never double-count") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vingest").toString
    try {
      val base = df(0L until 8L)
      val baseIdx = Similarity.pqBuild(base, m = 2, dsub = 2, kCodes = 4)
      Similarity.savePqIndex(baseIdx, s"$dir/base")

      // batch 0 re-sends base id 0; batch 1 re-sends batch 0's id 8 —
      // both must be dropped by the seen-id guard
      val stream = MemoryStream[(Long, Array[Float])](spark)
      val q = VectorIngest.sinkVectors(
        stream.toDF().toDF("vec_id", "embedding"),
        dir, s"$dir/ckpt").start()
      stream.addData(Seq(8L, 9L, 0L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      stream.addData(Seq(10L, 11L, 8L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      q.stop()

      val grown = VectorIngest.loadGrownIndex(spark, dir)
      // every id appears exactly once per subspace
      val perId = grown.codes.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perId.length === 12)
      assert(perId.forall(_.getLong(1) === 2L))

      // parity with the batch twin: pqIndexAdd of the fresh deltas
      val queries = df(Seq(0L, 5L))
      val twin = Similarity.pqIndexAdd(baseIdx, df(8L until 12L))
      val got = Similarity.pqAdcSearch(grown, queries, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = Similarity.pqAdcSearch(twin, queries, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === want.toSeq)

      // restart idempotency: re-delivering batch 1 recomputes the
      // identical partition — search results unchanged
      VectorIngest.processBatch(dir)(
        df(Seq(10L, 11L, 8L)), batchId = 1L)
      val again = Similarity.pqAdcSearch(
          VectorIngest.loadGrownIndex(spark, dir), queries, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(again.toSeq === want.toSeq)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("compactDeltas: one partition after, identical search; crash window safe") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vingest3").toString
    try {
      Similarity.savePqIndex(
        Similarity.pqBuild(df(0L until 8L), m = 2, dsub = 2, kCodes = 4),
        s"$dir/base")
      VectorIngest.processBatch(dir)(df(Seq(8L, 9L)), batchId = 0L)
      VectorIngest.processBatch(dir)(df(Seq(10L, 11L)), batchId = 1L)
      val queries = df(Seq(0L, 5L))
      val want = Similarity.pqAdcSearch(
          VectorIngest.loadGrownIndex(spark, dir), queries, k = 4)
        .collect().map(_.toString).toSeq
      // simulate the crash window: compacted partition written, old
      // partitions still present — load must dedup, not double-count
      spark.read.parquet(s"$dir/delta/batch_id=0")
        .unionAll(spark.read.parquet(s"$dir/delta/batch_id=1"))
        .write.mode("overwrite")
        .parquet(s"$dir/delta/batch_id=${VectorIngest.CompactedBatchId}")
      val during = Similarity.pqAdcSearch(
          VectorIngest.loadGrownIndex(spark, dir), queries, k = 4)
        .collect().map(_.toString).toSeq
      assert(during === want)
      // full compaction: one partition left, search unchanged
      VectorIngest.compactDeltas(spark, dir)
      val parts = new java.io.File(s"$dir/delta").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
      assert(parts.toSeq ===
        Seq(s"batch_id=${VectorIngest.CompactedBatchId}"))
      val after = Similarity.pqAdcSearch(
          VectorIngest.loadGrownIndex(spark, dir), queries, k = 4)
        .collect().map(_.toString).toSeq
      assert(after === want)
      // the round-12 hazard, now impossible by construction: a stream
      // resuming AFTER compaction reuses batch id 2 (its next unused
      // id) — a fresh delta partition, NOT the compacted one, so every
      // compacted vector stays served
      VectorIngest.processBatch(dir)(df(Seq(12L)), batchId = 2L)
      val resumed = VectorIngest.loadGrownIndex(spark, dir)
      val served = resumed.codes.filter(col("sub") === 0)
        .select(col("id")).collect().map(_.getLong(0)).sorted
      assert(served.toSeq === (0L to 12L))
      // and the reserved partition is unreachable from the batch seam
      intercept[IllegalArgumentException] {
        VectorIngest.processBatch(dir)(
          df(Seq(13L)), batchId = VectorIngest.CompactedBatchId)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("a re-delivered batch excludes only its own partition from the seen set") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vingest2").toString
    try {
      Similarity.savePqIndex(
        Similarity.pqBuild(df(0L until 8L), m = 2, dsub = 2, kCodes = 4),
        s"$dir/base")
      VectorIngest.processBatch(dir)(df(Seq(8L, 9L)), batchId = 0L)
      // batch 1 contains an id batch 0 admitted — dropped
      VectorIngest.processBatch(dir)(df(Seq(9L, 10L)), batchId = 1L)
      val ids1 = spark.read.parquet(s"$dir/delta/batch_id=1")
        .filter(col("sub") === 0).select(col("id"))
        .collect().map(_.getLong(0)).sorted
      assert(ids1.toSeq === Seq(10L))
      // the RETRY of batch 0 still admits its own ids (its partition
      // is excluded from the seen set) — no silent data loss
      VectorIngest.processBatch(dir)(df(Seq(8L, 9L)), batchId = 0L)
      val ids0 = spark.read.parquet(s"$dir/delta/batch_id=0")
        .filter(col("sub") === 0).select(col("id"))
        .collect().map(_.getLong(0)).sorted
      assert(ids0.toSeq === Seq(8L, 9L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}
