package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.SkewJoin
import graft.stream.StreamingRevenue

class SkewAndCheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin matches the plain join row-for-row under skew") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 7L else i.toLong, i * 1.0))
      .toDF("k", "v")
    val dim = (1 to 100).map(i => (i.toLong, s"name$i")).toDF("dk", "name")
    val plain = big.join(dim, col("k") === col("dk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedEquiJoin(big, dim, "k", "dk", salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSeq
    assert(salted.groupBy(identity).view.mapValues(_.size).toMap ===
      plain.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("saltedGroupSum equals direct groupBy sum") {
    val df = (1 to 2000).map(i => (i % 3, i * 0.5)).toDF("g", "v")
    val direct = df.groupBy(col("g")).agg(sum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val salted = SkewJoin.saltedGroupSum(df, "g", "v", 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    direct.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-6)
    }
  }

  test("saltedGroupSum spreads a constant-valued hot group across salts") {
    // the degenerate skew shape: one group, every row identical
    val hot = (1 to 4096).map(_ => (7, 1.0)).toDF("g", "v")
    val spread = hot
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(8)))
      .select("_salt").distinct().count()
    assert(spread === 8) // every stage-1 reducer gets a share of the hot group
    val total = SkewJoin.saltedGroupSum(hot, "g", "v", 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(total(7) - 4096.0) < 1e-6)
  }

  test("saltedCumSum equals the direct keyed cumsum under heavy skew") {
    import org.apache.spark.sql.expressions.Window
    // 9000 of 10000 rows in one hot group; integer values, duplicate
    // order values included (i div 3) to exercise the RANGE tie rule
    val rows = (1 to 10000).map { i =>
      val g = if (i % 10 == 0) s"cold${i % 7}" else "hot"
      (g, (i / 3).toLong, (i % 13).toLong)
    }
    val df = rows.toDF("g", "o", "v")
    val direct = df.withColumn("cum",
        sum(col("v")).over(Window.partitionBy(col("g")).orderBy(col("o"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "o", "v", "cum").collect().map(_.toSeq)
    for (salt <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedCumSum(df, "g", "o", "v", salt)
        .select("g", "o", "v", "cum").collect().map(_.toSeq)
      assert(salted.groupBy(identity).view.mapValues(_.size).toMap ===
        direct.groupBy(identity).view.mapValues(_.size).toMap,
        s"salt=$salt diverged from the direct window")
    }
    // constant-order group (degenerate range): everything is one tie
    val const = Seq(("g", 5L, 1L), ("g", 5L, 2L)).toDF("g", "o", "v")
    val got = SkewJoin.saltedCumSum(const, "g", "o", "v", 8)
      .select("cum").as[Long].collect().toSeq
    assert(got === Seq(3L, 3L))
  }

  test("T4: streaming query restarts from checkpoint without duplicating output") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("out").toString + "/agg"

    def ev(time: String, product: String, total: String): String =
      s"""{"event_time":"$time","product":"$product","total_price":"$total"}"""

    val input = MemoryStream[String](spark)
    val agg = StreamingRevenue.pipeline(StreamingRevenue.decodeJson(
      input.toDF().select(col("value").cast("binary").as("value"))))

    // run 1: two events, then advance event time to close their windows
    val q1 = StreamingRevenue.sink(agg, out, ckpt, "0 seconds").start()
    input.addData(Seq(ev("2025-01-01 10:05:00", "A", "10.00")))
    q1.processAllAvailable()
    input.addData(Seq(ev("2025-01-01 13:00:00", "B", "1.00")))
    q1.processAllAvailable()
    q1.stop()

    val afterRun1 = spark.read.parquet(out).count()
    assert(afterRun1 === 4) // A's 4 sliding windows closed

    // run 2: same checkpoint, same source (offsets recorded) + new data
    val q2 = StreamingRevenue.sink(agg, out, ckpt, "0 seconds").start()
    input.addData(Seq(ev("2025-01-01 16:00:00", "C", "2.00")))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out)
      .select("product", "revenue").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // A's windows appear exactly once each (no re-emission after restart)
    assert(rows.count(_._1 == "A") === 4)
    assert(rows.filter(_._1 == "A").forall(_._2 === 10.0))
    // B's windows closed once the 16:00 event advanced the watermark
    assert(rows.count(_._1 == "B") === 4)
  }
}
