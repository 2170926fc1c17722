package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.stream.{ResidualVectorIngest, VectorIngest}

/** [[VectorIngestSpec]]'s contracts on the residual lifecycle: the
  * streamed grown index must be bit-identical to the batch
  * `residualPqIndexAdd` twin, the seen-id guard must hold across
  * batches AND against the base, retries must self-heal, and the
  * reserved compaction partition must be unreachable from the stream
  * seam. The per-batch partition additionally carries the cell
  * assignment on every code row — both halves of the grown state in
  * one atomic write — so parity covers cells desync too. */
class ResidualVectorIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Array[Float] = Array(
    ((i * 37 + 11) % 17).toFloat / 17f,
    ((i * 53 + 5) % 19).toFloat / 19f,
    ((i * 71 + 3) % 23).toFloat / 23f,
    ((i * 89 + 7) % 29).toFloat / 29f)

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def buildBase(dir: String): Similarity.ResidualPqIndex = {
    val idx = Similarity.residualPqBuild(df(0L until 8L),
      nCentroids = 4, m = 2, dsub = 2, kCodes = 4)
    Similarity.saveResidualPqIndex(idx, s"$dir/base")
    idx
  }

  private def search(idx: Similarity.ResidualPqIndex) =
    Similarity.residualPqSearch(idx, df(Seq(0L, 5L)), k = 4, nProbe = 2)
      .collect().map(_.toString).toSeq

  test("streamed residual ingest equals the batch add twin; dups dropped") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rvingest").toString
    try {
      val baseIdx = buildBase(dir)
      // batch 0 re-sends base id 0; batch 1 re-sends batch 0's id 8
      val stream = MemoryStream[(Long, Array[Float])](spark)
      val q = ResidualVectorIngest.sinkVectors(
        stream.toDF().toDF("vec_id", "embedding"),
        dir, s"$dir/ckpt").start()
      stream.addData(Seq(8L, 9L, 0L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      stream.addData(Seq(10L, 11L, 8L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      q.stop()

      val grown = ResidualVectorIngest.loadGrownIndex(spark, dir)
      // every id appears exactly once per subspace, and exactly once
      // in the cells frame (codes and cells can never desync — one
      // partition write carries both)
      val perId = grown.codes.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perId.length === 12)
      assert(perId.forall(_.getLong(1) === 2L))
      val perCell = grown.cells.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perCell.length === 12)
      assert(perCell.forall(_.getLong(1) === 1L))

      // parity with the batch twin
      val twin = Similarity.residualPqIndexAdd(baseIdx, df(8L until 12L))
      assert(search(grown) === search(twin))

      // restart idempotency: re-delivering batch 1 recomputes the
      // identical partition — search results unchanged
      ResidualVectorIngest.processBatch(dir)(
        df(Seq(10L, 11L, 8L)), batchId = 1L)
      assert(search(ResidualVectorIngest.loadGrownIndex(spark, dir)) ===
        search(twin))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("residual compaction: one reserved partition, search unchanged, resume-safe") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rvingest2").toString
    try {
      buildBase(dir)
      ResidualVectorIngest.processBatch(dir)(df(Seq(8L, 9L)), batchId = 0L)
      ResidualVectorIngest.processBatch(dir)(df(Seq(10L, 11L)), batchId = 1L)
      val want = search(ResidualVectorIngest.loadGrownIndex(spark, dir))
      ResidualVectorIngest.compactDeltas(spark, dir)
      val parts = new java.io.File(s"$dir/delta").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
      assert(parts.toSeq ===
        Seq(s"batch_id=${VectorIngest.CompactedBatchId}"))
      assert(search(ResidualVectorIngest.loadGrownIndex(spark, dir)) ===
        want)
      // a stream resuming after compaction reuses id 2 — a fresh
      // partition, never the compacted one
      ResidualVectorIngest.processBatch(dir)(df(Seq(12L)), batchId = 2L)
      val served = ResidualVectorIngest.loadGrownIndex(spark, dir)
        .cells.select(col("id")).collect().map(_.getLong(0)).sorted
      assert(served.toSeq === (0L to 12L))
      intercept[IllegalArgumentException] {
        ResidualVectorIngest.processBatch(dir)(
          df(Seq(13L)), batchId = VectorIngest.CompactedBatchId)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("resumed stream replaying the crash-window batch interleaves safely with compaction") {
    // the exact interleaving the reserved negative partition id exists
    // for (r13 ask #6): the sink wrote batch 1 but the checkpoint
    // didn't commit; compaction runs; the resumed stream then replays
    // batch 1. Two orders can result, both must serve correctly.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rvingest3").toString
    try {
      buildBase(dir)
      ResidualVectorIngest.processBatch(dir)(df(Seq(8L, 9L)), batchId = 0L)
      ResidualVectorIngest.processBatch(dir)(df(Seq(10L, 11L)), batchId = 1L)
      val want = search(ResidualVectorIngest.loadGrownIndex(spark, dir))

      // order A — compaction COMPLETED (old partitions deleted), then
      // the replay lands: batch 1's ids are already seen inside the
      // compacted partition (its batch_id is the reserved negative id,
      // never the replayed one), so the re-created batch_id=1 partition
      // is EMPTY, not a duplicate admit
      ResidualVectorIngest.compactDeltas(spark, dir)
      ResidualVectorIngest.processBatch(dir)(df(Seq(10L, 11L)), batchId = 1L)
      val grownA = ResidualVectorIngest.loadGrownIndex(spark, dir)
      val perIdA = grownA.codes.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perIdA.length === 12 && perIdA.forall(_.getLong(1) === 2L))
      assert(search(grownA) === want)

      // order B — compaction CRASHED in its window (compacted partition
      // written, old partitions NOT yet deleted — the write-first /
      // delete-last discipline makes this the only reachable partial
      // state), and the resumed stream replays batch 1 on top: every
      // row is duplicated across compacted and original partitions, and
      // the replayed batch re-admits its ids (they look unseen only
      // through its own excluded partition). The load-time (id, sub)
      // dedup must serve the identical index regardless.
      ResidualVectorIngest.processBatch(dir)(df(Seq(12L)), batchId = 2L)
      val wantB = search(ResidualVectorIngest.loadGrownIndex(spark, dir))
      val all = ResidualVectorIngest.readDeltaExcept(spark, dir, -1L)
        .localCheckpoint(true)
      all.write.mode("overwrite").parquet(
        s"$dir/delta/batch_id=${VectorIngest.CompactedBatchId}")
      // mid-window: batch 2's rows now live in BOTH the compacted and
      // their original partition — the (id, sub) dedup must already
      // serve each id exactly once, values identical under the frozen
      // quantizers
      val grownMid = ResidualVectorIngest.loadGrownIndex(spark, dir)
      val perIdMid = grownMid.codes.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perIdMid.length === 13 && perIdMid.forall(_.getLong(1) === 2L))
      assert(search(grownMid) === wantB)
      // the replay then lands on the mid-window state: batch 2's ids
      // are seen through the compacted partition (excluded-partition
      // logic never hides the reserved id), so the rewrite empties
      // batch_id=2 instead of double-admitting
      ResidualVectorIngest.processBatch(dir)(df(Seq(12L)), batchId = 2L)
      val grownB = ResidualVectorIngest.loadGrownIndex(spark, dir)
      val perIdB = grownB.codes.groupBy(col("id"))
        .agg(count(lit(1)).as("n")).collect()
      assert(perIdB.length === 13 && perIdB.forall(_.getLong(1) === 2L))
      assert(search(grownB) === wantB)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("ingestParityProbe returns rows on the sf0.001 embeddings") {
    val emb = spark.read.parquet(sf("embeddings"))
    val got = ResidualVectorIngest.ingestParityProbe(spark, emb,
      nCentroids = 4, m = 2, dsub = 2, kCodes = 4, k = 3, nProbe = 2)
    assert(got.count() > 0)
  }
}
