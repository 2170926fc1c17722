package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Cleansing

/** Property tests (SURVEY.md §5 item 2): randomized dirty rows through the
  * batch cleanser; invariants that must hold for every surviving row.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest-
  * scalacheck bridge artifact is not in the offline dependency set).
  */
class CleansingPropertySpec extends SparkSpec {

  private val dateGen = Gen.oneOf(
    Gen.choose(1, 28).map(d => f"2025-01-$d%02d"),
    Gen.choose(1, 28).map(d => f"202501$d%02d"),
    Gen.choose(1, 28).map(d => f"2025-01-$d%02d 10:30:00"),
    Gen.const("garbage"), Gen.const(""))
  private val productGen = Gen.oneOf(
    Gen.alphaStr.map(_.take(8)), Gen.const(""), Gen.const("  "))
  private val numGen = Gen.oneOf(
    Gen.choose(0.0, 100.0).map(v => f"$v%.2f"),
    Gen.const("NaN?"), Gen.const(""))

  private val rowGen = for {
    d <- dateGen; p <- productGen; q <- Gen.choose(1, 5); u <- numGen
  } yield Seq(d, p, q.toString, u)

  test("cleanseBatch invariants: valid date, non-blank product, non-null 2dp amount") {
    (1L to 5L).foreach { seed =>
      val rows = Gen.listOfN(40, rowGen)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator failed for seed $seed"))
      val schema = StructType(Seq("order_date", "product", "quantity", "unit_price")
        .map(StructField(_, StringType, true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row(_: _*)), 2), schema)
      val out = Cleansing.cleanseBatch(df)
        .select("order_date", "product", "amount").collect()
      out.foreach { r =>
        assert(r.get(0) != null)
        val prod = r.getString(1)
        assert(prod != null && prod.trim.nonEmpty)
        val amt = r.getDouble(2)
        assert(!amt.isNaN && math.abs(amt * 100 - math.rint(amt * 100)) < 1e-9)
      }
    }
  }
}
