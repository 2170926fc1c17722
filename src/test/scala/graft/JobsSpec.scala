package graft

import java.time.LocalDate

import graft.ext.Dedup
import graft.gen.Retail
import graft.jobs.{BatchPipeline, CurationJob, StreamingJob}
import graft.stream.ElectionStream

class JobsSpec extends SparkSpec {

  test("BatchPipeline.run: CSVs in → partitioned parquet + KPI CSV out") {
    val in = java.nio.file.Files.createTempDirectory("bp_in").toString
    val pq = java.nio.file.Files.createTempDirectory("bp_pq").toString + "/daily"
    val csv = java.nio.file.Files.createTempDirectory("bp_csv").toString
    Retail.writeCsvDays(spark, in, LocalDate.of(2025, 2, 1), 3, 24)

    assert(BatchPipeline.run(spark, in, pq, csv, waitTimeoutSec = 10))

    val daily = spark.read.parquet(pq)
    assert(daily.columns.toSet === Set("order_date", "product", "total_amount"))
    assert(daily.count() > 0)
    // hive-partitioned by order_date → 3 date dirs
    val dateDirs = new java.io.File(pq).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("order_date="))
    assert(dateDirs.length === 3)
    // KPI CSV exists with a single data row
    val kpis = spark.read.option("header", "true")
      .csv(s"$csv/kpis")
    assert(kpis.count() === 1)
    assert(kpis.columns.toSeq ===
      Seq("grand_total", "distinct_products", "rows"))
  }

  test("BatchPipeline.run returns true and writes nothing on empty input") {
    val in = java.nio.file.Files.createTempDirectory("bp_empty").toString
    // a header-only csv: present (poll passes) but zero rows
    val w = new java.io.PrintWriter(s"$in/retail_x.csv")
    w.println("order_id,order_date,product,quantity,unit_price,amount")
    w.close()
    val pq = java.nio.file.Files.createTempDirectory("bp_pq2").toString + "/daily"
    val csv = java.nio.file.Files.createTempDirectory("bp_csv2").toString
    assert(BatchPipeline.run(spark, in, pq, csv, waitTimeoutSec = 5))
    assert(!new java.io.File(pq).exists())
  }

  test("S11 latestCsv picks the newest file by mtime") {
    val dir = java.nio.file.Files.createTempDirectory("latest").toString
    def write(name: String, rows: Seq[String], mtime: Long): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f)
      w.println("a,b"); rows.foreach(w.println); w.close()
      f.setLastModified(mtime)
    }
    write("old.csv", Seq("1,x"), 1700000000000L)
    write("new.csv", Seq("2,y"), 1800000000000L)
    val got = graft.io.Sources.latestCsv(spark, dir)
    assert(got.isDefined)
    assert(got.get.collect().map(_.getString(0)).toSeq === Seq("2"))
    assert(graft.io.Sources.latestCsv(spark,
      java.nio.file.Files.createTempDirectory("none").toString).isEmpty)
  }

  test("Retail.asRawDf yields the string-typed ingest shape") {
    val txns = Retail.dayRows(LocalDate.of(2025, 4, 1), 5, 3L)
    val df = Retail.asRawDf(spark, txns)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() === 5)
  }

  test("StreamingJob file mode builds a streaming event source with the full schema") {
    val dir = java.nio.file.Files.createTempDirectory("sj_events").toString
    val src = StreamingJob.source(spark,
      Map("STREAM_SOURCE" -> "file", "EVENTS_DIR" -> dir))
    assert(src.isStreaming)
    assert(src.columns.toSeq === graft.stream.EventSchema.fields)
  }

  test("dedupCorpus removes the near-dup partners, keeps min ids") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.minhashPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    val kept = Dedup.dedupCorpus(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pairs.nonEmpty)
    assert(kept.size === 500 - dropped.size)
    assert(dropped.forall(d => !kept.contains(d)))
  }

  test("CurationJob e2e: written receipt equals q300's rows at " +
      "sf0.001 and the curated corpus matches its final stage") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curation").toString
    val receipt = CurationJob.run(spark,
      "/root/testdata/sf0.001/documents.parquet", out)
    val want = SparkEntry.queries("q300_pipeline_receipt")(
      spark, "/root/testdata/sf0.001").collect()
    assert(receipt.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    // the artifact next to the output replays identically
    val onDisk = spark.read.parquet(s"$out/_receipt")
      .orderBy("stage_idx").collect()
    assert(onDisk.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    // the curated corpus IS the final stage's membership
    assert(spark.read.parquet(s"$out/corpus").count()
      === receipt.last.getLong(2))
  }

  test("CurationJob incremental sink: bloom decontam drops the leak, " +
      "the election log keeps the best copy per content key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curation_inc").toString
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val clean = "totally unrelated words about columnar shuffle planning"
    val stream = MemoryStream[(Long, String)](spark)
    val q = CurationJob.incrementalSink(
      stream.toDF().toDF("doc_id", "text"), bench,
      s"$dir/store", s"$dir/out", s"$dir/ckpt").start()
    stream.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // leak
      (2L, clean),                                           // admitted
      (3L, clean + " longer better copy of it"))             // other key
    q.processAllAvailable()
    q.stop()
    val reps = ElectionStream.bestPerKey(
      spark.read.option("basePath", s"$dir/store")
        .parquet(s"$dir/store").select("k", "id", "pref"))
      .collect().map(r => r.getLong(1)).toSet
    // the leaking doc never reached the election; both clean content
    // keys elected their (only) copies
    assert(reps === Set(2L, 3L))
  }
}
