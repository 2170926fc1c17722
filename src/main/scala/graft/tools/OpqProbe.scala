package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity => S}

/** Scratch measurement for the OPQ-style rotation question (round-12
  * item 6): does a deterministic signed permutation of dimensions
  * ahead of PQ subvector slicing buy recall at equal code budget on
  * this corpus? */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val brute = S.bruteTopK(emb, q, 5)
    def rec(approx: DataFrame): String = {
      val r = S.recallStats(brute, approx, 5).collect()(0)
      s"n_q=${r.getLong(0)} sum_hits=${r.getLong(1)} mean_micro=${r.getLong(2)}"
    }
    println("PLAIN   " + rec(
      S.pqAdcTopK(emb, q, 5, m = 16, dsub = 4, kCodes = 32, iters = 1)))
    val n = 64
    def rotCol(tag: String): Column => Column = {
      val perm = (0 until n).toArray.sortBy(d => Dedup.md5Long(s"$tag:p:$d"))
      val signs = (0 until n).map(d =>
        if (Dedup.md5Long(s"$tag:s:$d") % 2 == 1) 1.0 else -1.0)
      c => array((0 until n).map(j =>
        element_at(S.asDouble(c), perm(j) + 1) * signs(j)): _*)
    }
    for (tag <- Seq("opq", "opq2")) {
      val rot = rotCol(tag)
      val embR = emb.select(col("vec_id"), rot(col("embedding")).as("embedding"))
      println(s"ROT:$tag " + rec(
        S.pqAdcTopK(embR, embR.filter(col("vec_id") < 10), 5,
          m = 16, dsub = 4, kCodes = 32, iters = 1)))
    }
    // per-subspace variance of the RAW slicing: rotation can only help
    // if variance (or correlation) is unevenly spread across subspaces
    val dims = emb.select(posexplode(S.asDouble(col("embedding"))).as(Seq("d", "x")))
    dims.groupBy((col("d") / 4).cast("int").as("sub"))
      .agg(round(variance(col("x")), 6).as("var"))
      .orderBy(col("sub")).show(16, false)

    // ===== round-13: the "cheap 80% of OPQ" (permutation-only OPQ,
    // Ge et al. 2013's OPQ-P restricted to data-derived permutations —
    // no trained rotation, so it stays deterministic/replayable):
    // (a) variance-balanced allocation — sort dims by variance, deal
    //     round-robin so each subspace gets an even variance budget;
    // (b) PC1-guided allocation — sort dims by |PC1 loading| (the
    //     q212 power-iteration machinery), deal round-robin so the
    //     dominant axis spreads across subspaces instead of
    //     concentrating in one codebook.
    // Valid eval: cosine is permutation-invariant, so the raw-space
    // brute yardstick still scores the permuted-space index.
    def permuted(order: Array[Int], label: String): Unit = {
      val p: Column => Column = c =>
        array(order.toIndexedSeq.map(j =>
          element_at(S.asDouble(c), j + 1)): _*)
      val embP = emb.select(col("vec_id"), p(col("embedding")).as("embedding"))
      println(s"$label " + rec(
        S.pqAdcTopK(embP, embP.filter(col("vec_id") < 10), 5,
          m = 16, dsub = 4, kCodes = 32, iters = 1)))
    }
    def roundRobin(ranked: Array[Int], m: Int, dsub: Int): Array[Int] = {
      // ranked(r) = dim with rank r; subspace s takes ranks s, s+m,
      // s+2m, ... — the permutation lists each subspace's dims
      // contiguously so the standard slicing picks them up
      (0 until m).flatMap(s =>
        (0 until dsub).map(r => ranked(r * m + s))).toArray
    }
    val varRank = dims.groupBy(col("d"))
      .agg(variance(col("x")).as("v")).collect()
      .sortBy(r => (-r.getDouble(1), r.getInt(0)))
      .map(_.getInt(0))
    permuted(roundRobin(varRank, 16, 4), "VARPERM")
    val pc1Rank = S.pc1PowerIteration(emb).collect()
      .sortBy(r => (-math.abs(r.getLong(1)), r.getLong(0)))
      .map(_.getLong(0).toInt)
    permuted(roundRobin(pc1Rank, 16, 4), "PC1PERM")
    spark.stop()
  }
}
