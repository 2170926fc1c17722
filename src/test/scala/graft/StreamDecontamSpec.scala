package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}
import graft.stream.StreamDecontam

/** Stateless bloom decontamination at ingest: flag parity with the
  * batch bloom prober, the no-false-negative theorem, and the
  * streaming drop path end to end. */
class StreamDecontamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"))
    .toDF("doc_id", "text")
  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon shared with the benchmark"),
    (2L, "totally different words with no overlap at all here"),
    (3L, "more unrelated text that the filter should never flag"),
    (4L, "beta gamma delta epsilon zeta trailing benchmark n-gram"))
    .toDF("doc_id", "text")

  test("stateless flag matches the batch bloom prober on every doc") {
    val bits = StreamDecontam.bloomBits(bench, n = 5,
      hash = Dedup.OracleHash)
    val got = StreamDecontam.withBloomFlag(corpus, bits, n = 5,
        hash = Dedup.OracleHash)
      .select("doc_id", "is_contaminated").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Curation.bloomContamination(corpus, bench, n = 5,
        hash = Dedup.OracleHash)
      .select("doc_id").as[Long].collect().toSet
    corpus.select("doc_id").as[Long].collect().foreach { id =>
      assert(got(id) === (if (want(id)) 1L else 0L), s"doc $id")
    }
    // no false negatives: both true leaks are flagged
    assert(got(1L) === 1L && got(4L) === 1L)
  }

  test("streaming admit drops flagged docs before they land") {
    val bits = StreamDecontam.bloomBits(bench, n = 5,
      hash = Dedup.OracleHash)
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamDecontam.admit(
        stream.toDF().toDF("doc_id", "text"), bits, n = 5,
        hash = Dedup.OracleHash)
      .writeStream.format("memory").queryName("decontam_admit")
      .outputMode("append").start()
    stream.addData(
      (1L, "alpha beta gamma delta epsilon shared with the benchmark"),
      (2L, "totally different words with no overlap at all here"))
    q.processAllAvailable()
    stream.addData(
      (3L, "more unrelated text that the filter should never flag"),
      (4L, "beta gamma delta epsilon zeta trailing benchmark n-gram"))
    q.processAllAvailable()
    q.stop()
    val landed = spark.table("decontam_admit")
      .select("doc_id").as[Long].collect().toSet
    assert(landed === Set(2L, 3L))
  }
}
