package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev-only: isolates corrMatrix's cost from its probe harness — raw
  * 4-column scan baseline vs the operator on the same frame.
  * `runMain graft.tools.CorrProbe <sfDir>`. Not driver contract. */
object CorrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf3eq")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, sfDir).select(cols.map(col): _*)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[corr] $name%-22s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("scan_count")(li.count())
    timed("scan_longsum") {
      li.select(cols.map(c =>
          round(col(c).cast("double") * 1e4).cast("long").as(c)): _*)
        .agg(sum(expr(cols.mkString("+"))).as("s")).collect(); li.count()
    }
    timed("corr_1st")(graft.ext.Profiling.corrMatrix(li, cols).count())
    timed("corr_2nd")(graft.ext.Profiling.corrMatrix(li, cols).count())
    spark.stop()
  }
}
