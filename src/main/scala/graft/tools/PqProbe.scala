package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Dev-only probe for the flat-PQ ADC search path: dumps the top-k
  * frame and its recall@k against the brute-force yardstick on a
  * given sf dir. `runMain graft.tools.PqProbe <sfDir>`. Not part of
  * the driver contract.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).cache()
    println(s"[pq] corpus ${emb.count()} vectors")
    val q = emb.filter(col("vec_id") < 10)
    val t0 = System.nanoTime()
    val kc = sys.env.getOrElse("PQ_KCODES", "8").toInt
    val it = sys.env.getOrElse("PQ_ITERS", "1").toInt
    val adc = Similarity.pqAdcTopK(emb, q, k = 5, kCodes = kc, iters = it, m = sys.env.getOrElse("PQ_M", "8").toInt, dsub = sys.env.getOrElse("PQ_DSUB", "8").toInt)
    adc.show(15, false)
    println(f"[pq] adc ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val rec = Similarity.recallAtK(Similarity.bruteTopK(emb, q, 5), adc)
    rec.show(false)
    println("[pq] mean recall: " +
      rec.agg(avg(col("recall"))).collect()(0).getDouble(0))
    spark.stop()
  }
}
