package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Streaming KEEP-BEST representative election — the incremental twin
  * of the batch election (`Dedup.electRepresentatives`, q254). The
  * [[CurationStream]] fingerprint store admits the FIRST copy of each
  * content hash (arrival order = min-id policy); production curation
  * wants the BEST copy (longest, highest quality), and the best copy
  * may arrive AFTER a worse one was already admitted. This stream
  * maintains a log-structured per-key best (`pref` DESC, id ASC) and
  * emits an explicit DEMOTION record when a later batch upgrades a
  * key's representative, so downstream consumers can retract the
  * superseded document instead of double-counting it.
  *
  * Correctness rests on the election being a per-key ARGMAX under a
  * total order — an associative/commutative/idempotent merge, so
  * batch-at-a-time folding equals the batch election over the union
  * (the monoid `Dedup.electMergeParityStats` witnesses; that is also
  * why clusters here are keyed by a deterministic content KEY rather
  * than transitive pair components, which do not merge incrementally
  * without re-running label propagation).
  *
  * Layout (both log-structured, append-per-batch, compactable):
  *   store/batch_id=N: (k, id, pref)   — the batch's NEW per-key bests
  *   out/batch_id=N:   (id, k, pref, status, demotes)
  *     status ∈ kept | duplicate; `demotes` = the previously-best id
  *     this admission superseded (null otherwise).
  * Current representatives = [[bestPerKey]] over the whole store —
  * the same fold a periodic compaction job materializes.
  *
  * RESTART IDEMPOTENCY (the [[CurationStream]] contract): batch N
  * reads the store MINUS its own `batch_id=N` partition, so a
  * redelivered batch recomputes the identical decision set and
  * harmlessly overwrites its own two directories.
  *
  * APPEND-ONLY CAVEAT: the store folds by argmax, so it can only move
  * a key's representative UP the order. Feeding re-crawled corpora
  * through `Curation.snapshotDiff` composes cleanly for `added` docs
  * and for `changed` docs whose pref GREW (they upgrade + demote);
  * a changed doc whose pref SHRANK leaves its stale higher-pref store
  * row in place — retracting that requires a tombstone partition
  * (delete-key feed), the same mechanism `erasureAudit` gates, not
  * this stream.
  *
  * Scale shape: store rows are skinny (key, id, pref) triples; the
  * per-batch join is keyed on `k` (the store side can be pruned to
  * the batch's key set via a broadcast semi-join when batches are
  * small); [[bestPerKey]] windows partition on `k` — bounded by key
  * multiplicity, never corpus size. Periodic compaction = rewrite
  * `store/` as `bestPerKey(store)` under a fresh floor partition,
  * identical to the [[CurationStream]] compaction contract.
  */
object ElectionStream {

  private val storeSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("id", LongType),
    StructField("pref", LongType)))

  /** Fold a log-structured election store to its current per-key
    * representatives: argmax by (pref DESC, id ASC). */
  def bestPerKey(store: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k"))
      .orderBy(col("pref").desc, col("id").asc)
    store.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Tombstone compaction — the delete-key feed the APPEND-ONLY
    * caveat above points to: fold the store minus the deleted ids, so
    * a deleted representative falls back to the best SURVIVING row of
    * the log. Run as the compaction rewrite (the result goes under a
    * fresh floor partition replacing the old log).
    *
    * LIMITATION, by design of the log: only rows that were once best
    * are in the store — a copy that lost its admission race was never
    * appended, so the post-tombstone representative is the best
    * surviving APPENDED copy, not necessarily the best surviving
    * INGESTED copy. `Dedup.erasureReElectStats` is the exact batch
    * re-election over the full corpus; the delta between the two is
    * the price of the log-structured layout. */
  def applyTombstones(store: DataFrame, deleteIds: DataFrame): DataFrame =
    bestPerKey(store.join(
      deleteIds.select(col("id")).distinct(), Seq("id"), "left_anti"))

  /** Measured price of the log-structured layout under erasure — the
    * side-by-side the [[applyTombstones]] LIMITATION note describes in
    * prose: after a delete-key feed, the LOG can only fall back to the
    * best surviving row it ever APPENDED (losers were never stored),
    * while exact re-election ([[graft.ext.Dedup.erasureReElectStats]])
    * falls back to the best surviving INGESTED copy. This audit
    * simulates the log against a deterministic arrival order (seeded
    * md5 batch assignment — a row is appended iff it is its batch's
    * per-key winner and beats every earlier batch's winner, exactly
    * [[processElectBatch]]'s admission rule), applies the tombstones
    * to both layouts, and counts the divergence per source of the
    * exact representative.
    *
    * Emits one row per source: (source, n_components, n_divergent,
    * n_log_empty) — `n_divergent` counts clusters whose log
    * representative differs from the exact one (a missing log rep
    * counts), `n_log_empty` the clusters the log cannot serve at all.
    * Clusters with no surviving member are dropped (both layouts agree
    * they are gone).
    *
    * Scale shape: the election order is encoded into one injective
    * BIGINT (`pref * 1e8 + (1e8 - id)` — argmax under (pref DESC,
    * id ASC) becomes a plain max), so the whole audit is three
    * component-keyed windows and one aggregate; the delete feed joins
    * as a skinny anti-join. Nothing corpus-quadratic. */
  def logErasureDivergence(docs: DataFrame, comps: DataFrame,
                           deleteIds: DataFrame,
                           prefCol: org.apache.spark.sql.Column,
                           nBatches: Int = 5,
                           idCol: String = "doc_id",
                           srcCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBatches >= 2, "a single batch cannot exercise the log")
    val lab = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
        prefCol.cast("long").as("pref"))
      .join(comps.select(col(idCol).as("id"), col("component")),
        Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
      .withColumn("ord",
        col("pref") * lit(100000000L) + (lit(100000000L) - col("id")))
      .withColumn("batch",
        pmod(graft.ext.TextAnalysis.md5Hash60(
          concat(lit("eb:"), col("id").cast("string"))),
          lit(nBatches.toLong)))
    val wb = Window.partitionBy(col("component"), col("batch"))
      .orderBy(col("ord").desc)
    val winners = lab.withColumn("_rn", row_number().over(wb))
      .filter(col("_rn") === 1).drop("_rn")
    val wprev = Window.partitionBy(col("component")).orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val appended = winners
      .withColumn("_prevBest", max(col("ord")).over(wprev))
      .filter(col("_prevBest").isNull || col("ord") > col("_prevBest"))
    val del = deleteIds.select(col(idCol).cast("long").as("id")).distinct()
    def repOf(df: DataFrame, name: String) = {
      val wr = Window.partitionBy(col("component")).orderBy(col("ord").desc)
      df.join(del, Seq("id"), "left_anti")
        .withColumn("_rn", row_number().over(wr))
        .filter(col("_rn") === 1)
        .select(col("component"), col("id").as(s"${name}_id"),
          col("src").as(s"${name}_src"))
    }
    repOf(lab, "exact")
      .join(repOf(appended, "log"), Seq("component"), "left")
      .groupBy(col("exact_src").as(srcCol))
      .agg(count(lit(1)).as("n_components"),
        sum(when(col("log_id").isNull ||
          col("log_id") =!= col("exact_id"), 1L).otherwise(0L))
          .as("n_divergent"),
        sum(when(col("log_id").isNull, 1L).otherwise(0L))
          .as("n_log_empty"))
      .orderBy(col(srcCol))
  }

  /** The accumulated store MINUS `excludeBatchId`'s own partition
    * (idempotent-retry contract). Missing/empty store → typed empty
    * frame, so batch 0 needs no special case. */
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
        .select(col("k"), col("id"), col("pref"))
  }

  /** The per-batch body, exposed so the redelivery and demotion
    * contracts are directly testable without replaying a checkpoint.
    * `batch` must carry (idCol, keyCol source cols, prefCol source
    * cols); decisions land under `outPath/batch_id=N`, new bests under
    * `storePath/batch_id=N`. */
  def processElectBatch(keyCol: DataFrame => org.apache.spark.sql.Column,
                        prefCol: DataFrame => org.apache.spark.sql.Column,
                        storePath: String, outPath: String,
                        idCol: String = "doc_id")
                       (batch: Dataset[Row], batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val df = batch.toDF()
    val cand = df.select(col(idCol).cast("long").as("id"),
      keyCol(df).cast("string").as("k"),
      prefCol(df).cast("long").as("pref"))
    // intra-batch election first: one winner per key enters the
    // store compare; the rest are in-batch duplicates
    val w = Window.partitionBy(col("k"))
      .orderBy(col("pref").desc, col("id").asc)
    val ranked = cand.withColumn("_rn", row_number().over(w))
    val prior = bestPerKey(readStoreExcept(spark, storePath, batchId))
      .select(col("k"), col("id").as("prior_id"),
        col("pref").as("prior_pref"))
    val beats = col("prior_id").isNull ||
      col("pref") > col("prior_pref") ||
      (col("pref") === col("prior_pref") && col("id") < col("prior_id"))
    // two consumers (decision log + store append): checkpoint so the
    // store fold + join run once, not once per sink
    val decided = ranked
      .join(prior, Seq("k"), "left")
      .select(col("id"), col("k"), col("pref"),
        when(col("_rn") =!= 1, lit("duplicate"))
          .when(beats, lit("kept"))
          .otherwise(lit("duplicate")).as("status"),
        when(col("_rn") === 1 && beats && col("prior_id").isNotNull,
          col("prior_id")).as("demotes"))
      .localCheckpoint(true)
    decided
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    decided.filter(col("status") === "kept")
      .select(col("k"), col("id"), col("pref"))
      .write.mode("overwrite").parquet(s"$storePath/batch_id=$batchId")
  }

  /** foreachBatch writer chaining the whole per-batch election. */
  def sinkElected(docs: DataFrame,
                  keyCol: DataFrame => org.apache.spark.sql.Column,
                  prefCol: DataFrame => org.apache.spark.sql.Column,
                  storePath: String, outPath: String,
                  checkpointPath: String,
                  idCol: String = "doc_id"): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processElectBatch(keyCol, prefCol, storePath, outPath,
          idCol)(batch, batchId)
      }
      .option("checkpointLocation", checkpointPath)

  /** Drain-the-backlog deployment (state carries over via the store). */
  def sinkElectedAvailableNow(docs: DataFrame,
                              keyCol: DataFrame => org.apache.spark.sql.Column,
                              prefCol: DataFrame => org.apache.spark.sql.Column,
                              storePath: String, outPath: String,
                              checkpointPath: String,
                              idCol: String = "doc_id"): DataStreamWriter[Row] =
    sinkElected(docs, keyCol, prefCol, storePath, outPath,
      checkpointPath, idCol)
      .trigger(Trigger.AvailableNow())
}
