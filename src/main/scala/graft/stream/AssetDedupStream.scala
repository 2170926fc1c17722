package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

import graft.ext.Multimodal

/** Streaming perceptual asset dedup — the incremental twin of the q305
  * batch gate: incoming assets are admitted FIRST-COPY against a
  * log-structured store of banded perceptual hashes, so a re-encoded
  * copy of an asset the store has already seen is flagged at ingest
  * instead of at the next batch dedup run.
  *
  * Matching criterion is EXACTLY [[graft.ext.Multimodal.phashPairs]]'
  * (60-bit dHash, 4x15-bit chunk banding, Hamming ≤ `maxDist` — by
  * pigeonhole the banding is complete for distance ≤ 3), so a drained
  * stream flags the same pairs the batch query reports; parity is
  * proven in spec, not assumed.
  *
  * Layout (the [[ElectionStream]] conventions):
  *   store/batch_id=N: (id, phash, k, chunk) — 4 banded rows per
  *     ADMITTED asset (duplicates are never stored)
  *   out/batch_id=N:   (id, status kept|duplicate, dup_of, hamming)
  *     `dup_of` = the nearest (min Hamming, then min id) already-
  *     admitted or smaller-id in-batch neighbour within the band.
  *
  * FIRST-COPY CAVEAT: `dup_of` points at the matched neighbour, not a
  * canonical cluster representative — transitive chains (c dups b,
  * b dups a) keep their local pointers; canonical components remain
  * the batch path's job (q43), and keep-BEST election is
  * [[ElectionStream]]'s. RESTART IDEMPOTENCY: batch N reads the store
  * minus its own partition, so a redelivered batch recomputes the
  * identical decision set and overwrites its own two directories.
  *
  * Scale shape: store rows are skinny (id, phash, k, chunk); the
  * probe is a (k, chunk) equi-join — the store side can be pruned to
  * the batch's chunk keys by a broadcast semi-join when batches are
  * small; only banded candidates pay the bit_count verification.
  * Periodic compaction = rewrite `store/` under a fresh floor
  * partition (dedup by id), the shared compaction contract. */
object AssetDedupStream {

  private val storeSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("phash", LongType),
    StructField("k", IntegerType),
    StructField("chunk", LongType)))

  /** The 4 banded (k, chunk) rows of a (id, phash) frame. */
  private def banded(sigs: DataFrame): DataFrame = {
    val chunks = array((0 until 4).map { k =>
      struct(lit(k).as("k"),
        shiftright(col("phash"), 15 * k).bitwiseAND(lit(32767L))
          .as("chunk"))
    }: _*)
    sigs.select(col("id"), col("phash"), explode(chunks).as("c"))
      .select(col("id"), col("phash"), col("c.k").as("k"),
        col("c.chunk").as("chunk"))
  }

  /** Accumulated store minus `excludeBatchId` (idempotent-retry
    * contract); missing/empty store → typed empty frame. */
  def readStoreExcept(spark: SparkSession, storePath: String,
                      excludeBatchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
    if (!hasData)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], storeSchema)
    else
      spark.read.option("basePath", storePath).parquet(storePath)
        .filter(col("batch_id") =!= excludeBatchId)
        .select(col("id"), col("phash"), col("k"), col("chunk"))
  }

  /** The per-batch body, exposed for direct testing. `batch` carries
    * (idCol, payloadCol). */
  def processBatch(storePath: String, outPath: String, maxDist: Int = 3,
                   idCol: String = "doc_id",
                   payloadCol: String = "payload")
                  (batch: Dataset[Row], batchId: Long): Unit = {
    require(maxDist < 4, "chunk banding assumes maxDist <= 3")
    val spark = batch.sparkSession
    val sigs = Multimodal.withPerceptualHash(
        batch.toDF().select(col(idCol).cast("long").as("id"),
          col(payloadCol).as("payload")),
        payloadCol = "payload")
      .select(col("id"), col("phash"))
      .localCheckpoint(true)
    val bc = banded(sigs)
    // prior-store matches: nearest admitted neighbour within the band
    val prior = readStoreExcept(spark, storePath, batchId)
    def nearest(cand: DataFrame): DataFrame = cand
      .filter(col("hamming") <= maxDist)
      .groupBy(col("id"))
      .agg(min(struct(col("hamming"), col("dup_of"))).as("_m"))
      .select(col("id"), col("_m.dup_of").as("dup_of"),
        col("_m.hamming").as("hamming"))
    val fromStore = nearest(bc.as("a")
      .join(prior.as("p"), Seq("k", "chunk"))
      .select(col("a.id").as("id"), col("p.id").as("dup_of"),
        expr("bit_count(a.phash ^ p.phash)").as("hamming"))
      .filter(col("id") =!= col("dup_of")))
    // in-batch first-copy: a smaller-id batch member within the band
    val inBatch = nearest(bc.as("a")
      .join(bc.as("b").hint("merge"), Seq("k", "chunk"))
      .filter(col("a.id") > col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("dup_of"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming")))
    val matched = nearest(
      fromStore.unionByName(inBatch)
        .select(col("id"), col("dup_of"), col("hamming")))
    val decided = sigs
      .join(matched, Seq("id"), "left")
      .select(col("id"), col("phash"),
        when(col("dup_of").isNotNull, lit("duplicate"))
          .otherwise(lit("kept")).as("status"),
        col("dup_of"), col("hamming"))
      .localCheckpoint(true)
    decided
      .select(col("id"), col("status"), col("dup_of"), col("hamming"))
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    banded(decided.filter(col("status") === "kept")
        .select(col("id"), col("phash")))
      .write.mode("overwrite").parquet(s"$storePath/batch_id=$batchId")
  }

  /** foreachBatch writer chaining the per-batch admission. */
  def sink(docs: DataFrame, storePath: String, outPath: String,
           checkpointPath: String, maxDist: Int = 3,
           idCol: String = "doc_id",
           payloadCol: String = "payload"): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(storePath, outPath, maxDist, idCol,
          payloadCol)(batch, batchId)
      }
      .option("checkpointLocation", checkpointPath)

  /** Drain-the-backlog deployment (state carries via the store). */
  def sinkAvailableNow(docs: DataFrame, storePath: String,
                       outPath: String, checkpointPath: String,
                       maxDist: Int = 3, idCol: String = "doc_id",
                       payloadCol: String = "payload"): DataStreamWriter[Row] =
    sink(docs, storePath, outPath, checkpointPath, maxDist, idCol,
      payloadCol).trigger(Trigger.AvailableNow())
}
