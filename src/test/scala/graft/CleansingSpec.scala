package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Cleansing

class CleansingSpec extends SparkSpec {

  private def strDf(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(StructField(_, StringType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)), 2), schema)
  }

  test("P1 column-name normalization lowercases and trims") {
    val df = strDf(Seq(" Order_Date ", "PRODUCT"), Seq(Seq("2025-01-15", "x")))
    assert(Cleansing.normalizeColumnNames(df).columns.toSeq ===
      Seq("order_date", "product"))
  }

  test("P3 date cascade parses ISO date, yyyyMMdd, timestamp; rejects garbage") {
    val df = strDf(Seq("d"), Seq(
      Seq("2025-01-15"), Seq("20250115"), Seq("2025-01-15 10:30:00"),
      Seq("2025-01-15T10:30:00"), Seq("garbage"), Seq(null)))
    val got = df.select(Cleansing.dateCascade(col("d")).cast("string").as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("2025-01-15", "2025-01-15", "2025-01-15",
      "2025-01-15", null, null))
  }

  test("P4 timestamp cascade handles T-separator, millis, offset, bare date") {
    val df = strDf(Seq("t"), Seq(
      Seq("2025-01-15 10:30:00"), Seq("2025-01-15T10:30:00"),
      Seq("2025-01-15T10:30:00.123"), Seq("2025-01-15T10:30:00+05:30"),
      Seq("2025-01-15"), Seq("nope")))
    val got = df.select(Cleansing.timestampCascade(col("t")).isNotNull.as("ok"))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, true, true, true, true, false))
  }

  test("P2/P10 product resolution prefers product, falls back to item, repairs blanks") {
    val withProduct = strDf(Seq("product"), Seq(Seq(" Dosa "), Seq(""), Seq(null)))
    assert(Cleansing.withProduct(withProduct).select("product")
      .collect().map(_.getString(0)).toSeq === Seq("Dosa", "UNKNOWN", "UNKNOWN"))
    val withItem = strDf(Seq("item"), Seq(Seq("Idli")))
    assert(Cleansing.withProduct(withItem).select("product")
      .collect().map(_.getString(0)).toSeq === Seq("Idli"))
    val neither = strDf(Seq("other"), Seq(Seq("x")))
    assert(Cleansing.withProduct(neither).select("product")
      .collect().map(_.getString(0)).toSeq === Seq("UNKNOWN"))
  }

  test("P7-P8 amount: provided, derived qty*price, garbage→null, missing cols→0") {
    val provided = strDf(Seq("amount"), Seq(Seq("12.345"), Seq("junk"), Seq(null)))
    assert(Cleansing.withAmount(provided).select("amount")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSeq === Seq(Some(12.35), None, None))
    val derived = strDf(Seq("quantity", "price"), Seq(Seq("3", "10.10")))
    assert(Cleansing.withAmount(derived).select("amount")
      .collect().map(_.getDouble(0)).toSeq === Seq(30.3))
    val none = strDf(Seq("other"), Seq(Seq("x")))
    assert(Cleansing.withAmount(none).select("amount")
      .collect().map(_.getDouble(0)).toSeq === Seq(0.0))
  }

  test("cleanseBatch drops unparseable-amount rows (reference batch semantics)") {
    val df = strDf(Seq("order_date", "product", "amount"), Seq(
      Seq("2025-01-15", "A", "10.00"),
      Seq("2025-01-15", "B", "not-a-number"),
      Seq("2025-01-15", "C", null)))
    val out = Cleansing.cleanseBatch(df)
    assert(out.select("product").collect().map(_.getString(0)).toSeq === Seq("A"))
  }

  test("P9 cleanseStream maps malformed numerics to 0.0 instead of throwing (ANSI)") {
    val df = strDf(Seq("event_time", "product", "total_price"), Seq(
      Seq("2025-01-15T10:30:00", "A", "7.77"),
      Seq("2025-01-15T10:31:00", "B", "garbage"),
      Seq("2025-01-15T10:32:00", "C", null)))
    val out = Cleansing.cleanseStream(df).select("product", "line_amount")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out === Map("A" -> 7.77, "B" -> 0.0, "C" -> 0.0))
  }

  test("cleanseBatch drops unparseable dates and keeps observable schema") {
    val df = strDf(Seq("Order_Date", "Item", "Quantity", "Unit_Price"), Seq(
      Seq("2025-01-15", "A", "2", "5.00"),
      Seq("not-a-date", "B", "1", "3.00"),
      Seq("20250116", " C ", "4", "2.50")))
    val out = Cleansing.cleanseBatch(df)
    val rows = out.select("order_date", "product", "amount")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getDouble(2)))
    assert(rows.toSet === Set(
      ("2025-01-15", "A", 10.0), ("2025-01-16", "C", 10.0)))
  }

  test("cleanseStream missing ts column defaults to epoch then filters nothing out") {
    val df = strDf(Seq("product", "total_price"), Seq(Seq("A", "7.77")))
    val out = Cleansing.cleanseStream(df)
      .select("product", "line_amount", "order_ts")
    val r = out.collect().head
    assert(r.getString(0) === "A" && r.getDouble(1) === 7.77)
    assert(r.getTimestamp(2).toInstant.getEpochSecond === 0L)
  }
}
