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
}
