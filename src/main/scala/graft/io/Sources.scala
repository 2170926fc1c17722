package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input layer (SURVEY.md §2.1 S1-S5, S10-S11). */
object Sources {

  /** S1: CSV directory scan — header + recursive lookup like the
    * reference (pipeline_batch.py:115-119), but with an explicit schema
    * by default: `inferSchema=true` costs a full extra pass over the
    * input and yields non-deterministic types on dirty data. Pass
    * `schema = None` to reproduce the reference's inference behavior. */
  def csvDir(spark: SparkSession, path: String,
             schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("recursiveFileLookup", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** S2: block until files matching `glob` exist under `dir` (the
    * reference polls HDFS through py4j; on the JVM we hit the Hadoop
    * FileSystem API directly). Returns true when matched, false on
    * timeout. */
  def waitForInputFiles(spark: SparkSession, dir: String,
                        glob: String = "*.csv",
                        pollSeconds: Int = 5,
                        timeoutSeconds: Int = 300): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val deadline = System.nanoTime() + timeoutSeconds * 1000000000L
    var found = false
    while (!found && System.nanoTime() < deadline) {
      val matches =
        try fs.globStatus(new Path(p, glob))
        catch { case _: java.io.FileNotFoundException => null }
      found = matches != null && matches.nonEmpty
      if (!found) Thread.sleep(pollSeconds * 1000L)
    }
    found
  }

  /** S3: empty-input guard — `df.isEmpty` (native; the reference's
    * `df.rdd.isEmpty()` forces an RDD conversion, SURVEY.md §4). */
  def isEmpty(df: DataFrame): Boolean = df.isEmpty

  /** S10: parquet dataset scan (the pyarrow serving read, as Spark). */
  def parquetDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** ORC dataset scan — the second columnar lake format a Spark-native
    * engine is expected to ingest (native vectorized reader; same
    * pushdown/pruning surface as parquet — `Explain` shows
    * PushedFilters on ORC scans too). Round-trip proven by q174. */
  def orcDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  /** S11: newest CSV in a directory by modification time → DataFrame
    * (the batch dashboard's latest-file pick, dashboard/app.py:10-15). */
  def latestCsv(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      try fs.globStatus(new Path(p, "*.csv"))
      catch { case _: java.io.FileNotFoundException => null }
    Option(files).filter(_.nonEmpty).map { fl =>
      val newest = fl.maxBy(_.getModificationTime).getPath.toString
      spark.read.option("header", "true").csv(newest)
    }
  }
}
