package graft

import org.apache.spark.sql.functions._

import graft.gen.{EventJson, Replay, Retail}
import graft.stream.StreamingRevenue

/** The reference producer's replay loop semantics (S9 + P16/P17
  * companion): pacing, seeded shuffle, wrap-around looping, and the
  * file-landing transport that feeds the streaming file source.
  */
class ReplaySpec extends SparkSpec {

  private def rows: IndexedSeq[String] =
    Retail.rows(java.time.LocalDate.parse("2025-01-15"), days = 1,
      txPerDay = 36).map(EventJson.fromTxn).toIndexedSeq

  test("replay paces events at 1/rate and stops at maxEvents") {
    var slept = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = Replay.run(rows,
      Replay.Config(ratePerSecond = 10.0, shuffle = false, maxEvents = 7),
      out += _, slept += _)
    assert(n === 7 && out.size === 7)
    assert(slept === 6 * 100) // 100 ms between consecutive events, none after the last
    assert(out.toSeq === rows.take(7)) // unshuffled order preserved
  }

  test("looping replay wraps around and reshuffles deterministically") {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val size = rows.size
    val n = Replay.run(rows,
      Replay.Config(ratePerSecond = 0, shuffle = true, loop = true,
        maxEvents = size * 2 + 3, seed = 7L),
      out += _, _ => fail("rate 0 must not sleep"))
    assert(n === size * 2 + 3)
    // each pass is a permutation of the full row set
    assert(out.slice(0, size).sorted === rows.sorted)
    assert(out.slice(size, 2 * size).sorted === rows.sorted)
    // seeded: an identical run replays the identical sequence
    val out2 = scala.collection.mutable.ArrayBuffer.empty[String]
    Replay.run(rows, Replay.Config(ratePerSecond = 0, shuffle = true,
      loop = true, maxEvents = size * 2 + 3, seed = 7L), out2 += _, _ => ())
    assert(out.toSeq === out2.toSeq)
  }

  test("replaying an empty row set terminates immediately, even when looping") {
    val n = Replay.run(IndexedSeq.empty,
      Replay.Config(ratePerSecond = 0, loop = true, maxEvents = 10),
      _ => fail("nothing to send"), _ => ())
    assert(n === 0L)
  }

  test("file landing sink feeds the streaming file source end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("replay_land").toString
    val sink = new Replay.FileSink(dir, batchSize = 10)
    val n = Replay.run(rows, Replay.Config(ratePerSecond = 0,
      shuffle = false, maxEvents = 25), sink.send, _ => ())
    sink.flush()
    assert(n === 25)
    // 2 full batches + 1 partial, all atomic-renamed into place
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".json")) === 3)
    val out = java.nio.file.Files.createTempDirectory("replay_out").toString + "/agg"
    val ckpt = java.nio.file.Files.createTempDirectory("replay_ckpt").toString
    val agg = StreamingRevenue.pipeline(
      StreamingRevenue.fileJsonSource(spark, dir))
    val q = StreamingRevenue.sinkAvailableNow(agg, out, ckpt).start()
    q.awaitTermination()
    // watermark semantics: windows still open at end-of-input are not
    // emitted in append mode, so assert on the cleansed input instead
    val cleansed = StreamingRevenue.transformOrders(
      spark.read.schema(graft.stream.EventSchema.schema).json(dir))
    assert(cleansed.count() === 25)
    assert(cleansed.filter(col("line_amount") > 0).count() === 25)
  }
}
