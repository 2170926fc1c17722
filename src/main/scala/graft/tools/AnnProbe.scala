package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Dev-only stage decomposition for the IVF-blocked ANN family: times
  * the assignment contraction and the bucket pair join separately, at
  * several nCentroids, against a (scaled) embeddings dir — the tool
  * that sizes `autoCentroids`. `runMain graft.tools.AnnProbe <sfDir>`.
  * Not part of the driver contract.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf3eq")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    println(s"[ann] corpus $n vectors")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann] $name%-36s rows=$r%-12d ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("c"))
        .collect().head.getLong(0)

    for (nc <- Seq(Similarity.autoCentroids(n),
                   Similarity.autoCentroids(n) * 4)) {
      timed(s"assign nc=$nc") {
        consume(Similarity.ivfAssign(emb, nc, 2))
      }
      var assigned: org.apache.spark.sql.DataFrame = null
      timed(s"assign+ckpt nc=$nc") {
        assigned = Similarity.ivfAssign(emb, nc, 2).localCheckpoint()
        assigned.count()
      }
      timed(s"pair_join_only nc=$nc") {
        val denom = col("a.nrm") * col("b.nrm")
        val sim = when(denom === 0.0, 0.0)
          .otherwise(graft.functions.VectorFunctions.dot_product(
            col("a.v"), col("b.v")) / denom)
        val joined = assigned.as("a").join(assigned.as("b"),
            col("a.centroid_id") === col("b.centroid_id") &&
              col("a.id") =!= col("b.id"))
          .select(col("a.id").as("id"), col("b.id").as("nid"),
            round(sim, 6).as("s"))
          .groupBy(col("id"))
          .agg(max(struct(col("s"), (-col("nid")).as("nn"))).as("m"),
            countDistinct(col("nid")).as("n_candidates"))
        if (nc < 300) joined.explain("formatted")
        consume(joined)
      }
      timed(s"nn_within nc=$nc") {
        consume(Similarity.nnWithinBlocks(emb, nCentroids = nc))
      }
      timed(s"hard_neg nc=$nc") {
        consume(Similarity.hardNegatives(
          emb.withColumn("label", pmod(col("vec_id"), lit(7)).cast("int")),
          k = 3, nCentroids = nc))
      }
    }
    spark.stop()
  }
}
