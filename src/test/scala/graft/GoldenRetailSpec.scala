package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.gen.Retail
import graft.io.{Sinks, Sources}
import graft.ops.{Aggregations, Cleansing}

/** Golden end-to-end smoke of the reference's retail scenario: seeded
  * generator → CSV → batch cleanse → daily revenue + KPI triple →
  * partitioned parquet, asserting determinism and invariants (SURVEY.md
  * §5 item 5).
  */
class GoldenRetailSpec extends SparkSpec {

  test("ORC sink + scan round-trips values and schema exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val df = Seq((1L, "a", 1.25), (2L, "b", -3.5), (3L, null, 0.0))
      .toDF("id", "s", "v")
    Sinks.orcDir(df, dir)
    val back = Sources.orcDir(spark, dir)
    // names + types survive; nullability widens on read (ORC files,
    // like parquet, don't carry Spark's non-null markers)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("generator → cleanse → aggregate pipeline is deterministic and consistent") {
    val dir = java.nio.file.Files.createTempDirectory("retail").toString
    Retail.writeCsvDays(spark, dir, LocalDate.of(2025, 1, 1),
      days = 5, txPerDay = 36, seed = 2024L)

    assert(Sources.waitForInputFiles(spark, dir, "*.csv", 1, 10))
    val raw = Sources.csvDir(spark, dir, Some(Retail.CsvSchema))
    assert(!Sources.isEmpty(raw))
    assert(raw.count() === 5 * 36)

    val clean = Cleansing.cleanseBatch(raw)
    assert(clean.count() === 5 * 36) // generator emits no dirty rows

    val daily = Aggregations.dailyRevenue(clean)
    val kpis = Aggregations.kpis(clean).collect().head
    // invariants: totals agree between the two aggregates; every row kept
    val dailySum = daily.agg(round(sum(col("total_amount")), 2)).collect()
      .head.getDouble(0)
    assert(math.abs(dailySum - kpis.getDouble(0)) <= 0.05) // per-group rounding drift
    assert(kpis.getLong(2) === 180L)
    assert(kpis.getLong(1) <= Retail.Catalogue.size)

    // determinism: regenerate and recompute → identical grand total
    val dir2 = java.nio.file.Files.createTempDirectory("retail2").toString
    Retail.writeCsvDays(spark, dir2, LocalDate.of(2025, 1, 1),
      days = 5, txPerDay = 36, seed = 2024L)
    val kpis2 = Aggregations.kpis(Cleansing.cleanseBatch(
      Sources.csvDir(spark, dir2, Some(Retail.CsvSchema)))).collect().head
    assert(kpis2.getDouble(0) === kpis.getDouble(0))

    // S6 partitioned parquet sink round-trips with partition pruning intact
    val out = java.nio.file.Files.createTempDirectory("curated").toString + "/daily"
    Sinks.partitionedParquet(daily, out)
    val back = spark.read.parquet(out)
    assert(back.count() === daily.count())
    assert(back.filter(col("order_date") === "2025-01-03").count() > 0)

    // S7 single CSV sink
    val csvOut = java.nio.file.Files.createTempDirectory("kpi").toString + "/kpis"
    Sinks.singleCsv(Aggregations.kpis(clean), csvOut)
    val files = new java.io.File(csvOut).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
  }
}
