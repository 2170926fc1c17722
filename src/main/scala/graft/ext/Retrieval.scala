package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval primitives: fusing independent rankers (lexical
  * BM25, embedding cosine, link centrality, …) into one result list.
  * Extension tier — the standard first stage of a RAG / search stack
  * once a corpus has both a term index and an embedding index.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al.): each ranker contributes
    * 1/(c + rank) for the ids it ranked; ids missing from a ranker
    * contribute nothing for it. Returns the fused top `topK` as
    * (id, n_rankers, rrf_micro, rank).
    *
    * Every input is (id, rank) with rank 1-based — rankings are
    * positional, so the fusion is score-scale-free (the reason RRF
    * beats score averaging across heterogeneous rankers).
    *
    * Determinism: each reciprocal is micro-quantized to a BIGINT
    * before summing (integer sums are reduce-order-free), ties break
    * on id.
    *
    * Scale: inputs are top-N ranker outputs (N ~ 10²-10³ per query),
    * so the union + one aggregate is bounded by rankers × N rows —
    * never corpus-sized. The full-corpus work lives inside each
    * ranker, which is where LSH/IVF blocking already bounds it. */
  def rrf(rankings: Seq[DataFrame], c: Int = 60, topK: Int = 20,
          idCol: String = "id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val normalized = rankings.map(_.select(
      col(idCol).as("id"),
      (round(lit(1e6) / (lit(c) + col(rankCol)))).cast("long")
        .as("contrib_micro")))
    val unioned = normalized.reduce(_.unionAll(_))
    val fused = unioned.groupBy(col("id"))
      .agg(count(lit(1)).as("n_rankers"),
        sum(col("contrib_micro")).as("rrf_micro"))
    val w = Window.orderBy(col("rrf_micro").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("rank"))
  }

  /** Second-stage feature rerank over a fused candidate list — the
    * cross-encoder SLOT of a retrieve-then-rerank stack with a
    * deterministic linear scorer standing in for the model (no model
    * runtime in this environment; the Spark-side plumbing — candidate
    * join, per-feature normalization, weighted fusion, re-rank — is
    * the real, tested part; swap the scorer for a batched model UDF
    * without touching the shape). Each feature is an INTEGER column
    * keyed by id (quantize first — the repo convention); features are
    * min-max normalized to [0, 10⁶] OVER THE CANDIDATE SET (integer
    * floor division, so reranking is scale-free like RRF but keeps
    * score MAGNITUDE information RRF throws away), then summed with
    * integer weights. A candidate missing from a feature frame
    * contributes 0 for it (the RRF missing-id convention); a feature
    * frame with multiple rows per id contracts to max(f) (enforced —
    * duplicates would otherwise skew bounds and double-count); a
    * feature constant across candidates normalizes to 0 for all.
    *
    * Determinism: all-integer pipeline — (f − lo)·10⁶ div (hi − lo)
    * is exact and reduce-order-free; ties break on id. Feature span
    * must fit (hi − lo)·10⁶ in int64: span < 9·10¹².
    *
    * Scale: candidates are a top-K list (K ~ 10¹-10²) materialized
    * once (several consumers — one probe per feature); each feature
    * frame is probed by a BROADCAST candidate join (the corpus-sized
    * work stays inside the feature producers), bounds are a 1-row
    * broadcast back, and the final rank window runs over the
    * ≤ (features+1)·K contribution rows contracted by one hash
    * aggregate — the rrf plan shape exactly. */
  def featureRerank(candidates: DataFrame,
                    features: Seq[(DataFrame, String, Long)],
                    topK: Int = 10,
                    idCol: String = "id"): DataFrame = {
    require(features.nonEmpty, "featureRerank needs at least one feature")
    import org.apache.spark.storage.StorageLevel
    val cand = candidates.select(col(idCol).as("id")).distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val zero = cand.select(col("id"), lit(0L).as("contrib"))
    val contribs = features.map { case (f, featCol, weight) =>
      // contract to ONE row per candidate id (max — deterministic,
      // order-free): a feature frame that wasn't pre-aggregated would
      // otherwise skew the bounds AND double-count contributions
      val fj = f.select(col(idCol).as("id"),
          col(featCol).cast("long").as("f"))
        .join(broadcast(cand), Seq("id"))
        .groupBy(col("id")).agg(max(col("f")).as("f"))
      // bounds as whole-frame window aggregates so fj's upstream plan
      // executes ONCE (a separate bounds aggregate + rejoin consumed
      // fj twice, replaying the feature producer's scan per feature).
      // The unpartitioned window is SAFE HERE ONLY because fj is the
      // candidate-set contraction (≤ K rows — EntrySpec's window gate
      // allowlists this shape over contractions).
      val wAll = Window.partitionBy()
      fj.select(col("id"), col("f"),
          min(col("f")).over(wAll).as("_lo"),
          max(col("f")).over(wAll).as("_hi"))
        .select(col("id"),
          (lit(weight) * coalesce(
            expr("(f - _lo) * 1000000 div nullif(_hi - _lo, 0)"),
            lit(0L))).as("contrib"))
    }
    val scored = (zero +: contribs).reduce(_.unionAll(_))
      .groupBy(col("id")).agg(sum(col("contrib")).as("rerank_micro"))
    val w = Window.orderBy(col("rerank_micro").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("rank"))
  }
}
