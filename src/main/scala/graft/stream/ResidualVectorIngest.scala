package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ext.Similarity

/** Streaming vector ingestion into a persisted RESIDUAL PQ index —
  * the [[VectorIngest]] twin for the residual lifecycle (q202's
  * [[graft.ext.Similarity.residualPqIndexAdd]]): every micro-batch
  * coarse-assigns against the FROZEN stored seeds, recentres on the
  * FROZEN per-cell means, encodes against the FROZEN residual
  * codebooks, and appends one delta partition; ids already indexed by
  * the base or any earlier batch are dropped, and the grown index
  * survives restarts without re-admitting or losing vectors.
  *
  * Layout under `indexDir`:
  *   base/  — a [[graft.ext.Similarity.saveResidualPqIndex]] artifact
  *            (codes + cells + cents + recenter + coarse + meta),
  *            written ONCE by the training job;
  *   delta/batch_id=N/ — batch N's fresh rows
  *            (id, sub, code, centroid_id) — the cell assignment
  *            rides on every code row (the sub = 0 slice recovers the
  *            cells frame), so ONE partition write captures both
  *            halves of the grown state atomically; a separate cells
  *            store could crash out of sync with its codes.
  *
  * Restart idempotency, compaction, and the reserved
  * [[VectorIngest.CompactedBatchId]] partition follow the
  * [[VectorIngest]] contracts verbatim — batch N excludes only its
  * own partition from the seen set, compaction rewrites into the
  * negative reserved id no resumed stream can overwrite, and the
  * load-time (id, sub) dedup makes the compaction crash window safe.
  */
object ResidualVectorIngest {

  private val rowsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sub", IntegerType),
    StructField("code", LongType),
    StructField("centroid_id", LongType)))

  /** All delta-partition rows EXCEPT `excludeBatchId`'s own (pass -1
    * to read everything). Empty/missing delta dir → empty frame with
    * the combined schema, so batch 0 needs no special case. */
  def readDeltaExcept(spark: SparkSession, indexDir: String,
                      excludeBatchId: Long): DataFrame = {
    val deltaPath = s"$indexDir/delta"
    val p = new org.apache.hadoop.fs.Path(deltaPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
    if (!hasData)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowsSchema)
    else
      spark.read.option("basePath", deltaPath).parquet(deltaPath)
        .filter(col("batch_id") =!= excludeBatchId)
        .select(col("id"), col("sub"), col("code"), col("centroid_id"))
  }

  /** The per-batch body (the [[VectorIngest.processBatch]] seam):
    * seen = base cell ids ∪ delta ids of batch_id ≠ N → frozen
    * residual encode → overwrite `delta/batch_id=N`. */
  def processBatch(indexDir: String)
                  (batch: Dataset[Row], batchId: Long): Unit = {
    require(batchId >= 0, s"stream batch ids are non-negative: $batchId")
    val spark = batch.sparkSession
    val base = Similarity.loadResidualPqIndex(spark, s"$indexDir/base")
    val seenIds = base.cells.select(col("id"))
      .unionAll(readDeltaExcept(spark, indexDir, batchId)
        .filter(col("sub") === 0).select(col("id")))
    Similarity.residualEncodeFresh(base, batch.toDF(), seenIds)
      .write.mode("overwrite")
      .parquet(s"$indexDir/delta/batch_id=$batchId")
  }

  /** The served artifact: stored base plus every delta partition's
    * codes AND cell assignments — bit-identical search results to the
    * batch-built [[graft.ext.Similarity.residualPqIndexAdd]] twin
    * over the same fresh vectors (spec-pinned parity). The (id, sub)
    * dedup mirrors [[VectorIngest.loadGrownIndex]]: a compaction
    * crash window leaves duplicate rows whose values are identical
    * under frozen quantizers, so which copy survives is irrelevant. */
  def loadGrownIndex(spark: SparkSession, indexDir: String)
      : Similarity.ResidualPqIndex = {
    val base = Similarity.loadResidualPqIndex(spark, s"$indexDir/base")
    val delta = readDeltaExcept(spark, indexDir, -1L)
      .dropDuplicates("id", "sub")
    base.copy(
      codes = base.codes.unionAll(
        delta.select(col("id"), col("sub"), col("code"))),
      cells = base.cells.unionAll(
        delta.filter(col("sub") === 0)
          .select(col("id"), col("centroid_id"))))
  }

  /** Compact every delta partition into the reserved
    * `batch_id=` [[VectorIngest.CompactedBatchId]] partition — same
    * write-first / delete-last crash discipline, same
    * negative-id-can-never-collide guarantee. */
  def compactDeltas(spark: SparkSession, indexDir: String): Unit = {
    val all = readDeltaExcept(spark, indexDir, -1L)
      .dropDuplicates("id", "sub")
      .localCheckpoint(true)
    val deltaPath = new org.apache.hadoop.fs.Path(s"$indexDir/delta")
    val fs = deltaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val target = s"batch_id=${VectorIngest.CompactedBatchId}"
    val old =
      if (!fs.exists(deltaPath)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(deltaPath).map(_.getPath)
        .filter(p => p.getName.startsWith("batch_id=") &&
          p.getName != target)
    all.write.mode("overwrite").parquet(s"$indexDir/delta/$target")
    old.foreach(p => fs.delete(p, true))
  }

  /** foreachBatch writer chaining the per-batch encode; append output
    * mode (each fresh vector's rows are emitted exactly once). */
  def sinkVectors(vectors: DataFrame, indexDir: String,
                  checkpointPath: String): DataStreamWriter[Row] =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(indexDir)(batch, batchId)
      }
      .option("checkpointLocation", checkpointPath)

  /** Stream↔batch parity as an ORACLE row — [[VectorIngest
    * .ingestParityProbe]] on the residual lifecycle: trains the base
    * residual index on the 80% cohort (vec_id % 5 ≠ 0) with the q202
    * geometry, ingests the 20% delta through a REAL foreachBatch
    * stream in two micro-batches (the second RE-SENDING one of the
    * first's ids — the seen-id guard exercised on the wire), then
    * searches the grown ON-DISK artifact. The result must be
    * bit-identical to the batch-built twin, so the DuckDB oracle is
    * q202's frozen-add replay VERBATIM: any stream-path divergence
    * (lost batch, double-admitted id, desynced cells/codes, codec
    * drift) reds the row.
    *
    * The delta collect is the sanctioned fixture-sized parity-probe
    * class — MemoryStream feeds from driver rows by construction; the
    * stream runs in an isolated 1-shuffle-partition session so
    * state/exchange init costs stay off the probe (the q193 lesson). */
  def ingestParityProbe(spark: SparkSession, emb: DataFrame,
                        nCentroids: Int = 16, m: Int = 16, dsub: Int = 4,
                        kCodes: Int = 32, k: Int = 5, nProbe: Int = 4)
      : DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rvingest_probe").toString
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      Similarity.saveResidualPqIndex(
        Similarity.residualPqBuild(base, nCentroids, m, dsub, kCodes,
          iters = 1),
        s"$dir/base")
      val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val (b0, b1) = delta.partition(_._1 % 10 == 0)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "1")
      val input = MemoryStream[(Long, Array[Float])](ss)
      val q = sinkVectors(input.toDF().toDF("vec_id", "embedding"),
        dir, s"$dir/ckpt").start()
      try {
        input.addData(b0.toSeq: _*)
        q.processAllAvailable()
        // re-send one admitted id alongside the second batch
        input.addData((b1 ++ b0.take(1)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      // eager pin BEFORE the temp artifact is deleted
      Similarity.residualPqSearch(loadGrownIndex(spark, dir),
          emb.filter(col("vec_id") < 10), k, nProbe)
        .localCheckpoint(true)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}
