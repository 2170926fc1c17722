package graft.gen

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic synthetic retail-transaction generator — the shape of
  * the reference's data generator (SURVEY.md §2.1 S12: seeded, 15-product
  * catalogue with per-product price bands, 30 stores, qty 1-5, discount
  * factor drawn from {1, 1, 1, 0.9, 0.95}, `order_id = YYYYMMDD-NNNN`,
  * one batch of rows per day). Catalogue contents are our own; the
  * semantics to preserve are cardinalities, value ranges, and seeded
  * reproducibility.
  */
object Retail {

  final case class Product(name: String, lo: Double, hi: Double)

  /** 15 products with price bands. */
  val Catalogue: Seq[Product] = Seq(
    Product("Espresso Beans", 180.0, 260.0),
    Product("Oolong Tea", 90.0, 140.0),
    Product("Sourdough Loaf", 60.0, 95.0),
    Product("Almond Croissant", 45.0, 70.0),
    Product("Greek Yogurt", 30.0, 55.0),
    Product("Cold Brew Bottle", 70.0, 110.0),
    Product("Granola Pack", 85.0, 130.0),
    Product("Orange Juice", 40.0, 65.0),
    Product("Dark Chocolate", 95.0, 150.0),
    Product("Trail Mix", 75.0, 120.0),
    Product("Protein Bar", 35.0, 60.0),
    Product("Sparkling Water", 25.0, 45.0),
    Product("Matcha Latte Kit", 160.0, 240.0),
    Product("Honey Jar", 110.0, 170.0),
    Product("Rye Crackers", 50.0, 80.0))

  /** 30 stores: id + city label. */
  val Stores: Seq[(String, String)] =
    (1 to 30).map(i => (f"ST-$i%02d", s"City-${(i - 1) / 3 + 1} District-${(i - 1) % 3 + 1}"))

  val Discounts: Seq[Double] = Seq(1.0, 1.0, 1.0, 0.9, 0.95)

  final case class Txn(order_id: String, order_date: String, store_id: String,
                       store_city: String, product: String, quantity: Int,
                       unit_price: Double, amount: Double)

  private val DateFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Rows for one day; deterministic in (seed, day, txPerDay). */
  def dayRows(day: LocalDate, txPerDay: Int, seed: Long): Seq[Txn] = {
    val rng = new Random(seed ^ day.toEpochDay)
    (1 to txPerDay).map { n =>
      val p = Catalogue(rng.nextInt(Catalogue.size))
      val (sid, city) = Stores(rng.nextInt(Stores.size))
      val qty = 1 + rng.nextInt(5)
      val disc = Discounts(rng.nextInt(Discounts.size))
      val price = math.rint((p.lo + (p.hi - p.lo) * rng.nextDouble()) * disc * 100) / 100
      val amount = math.rint(qty * price * 100) / 100
      Txn(
        order_id = s"${day.format(DateFmt)}-${"%04d".format(n)}",
        order_date = day.toString,
        store_id = sid,
        store_city = city,
        product = p.name,
        quantity = qty,
        unit_price = price,
        amount = amount)
    }
  }

  /** All rows for `days` consecutive days starting at `start`. */
  def rows(start: LocalDate, days: Int, txPerDay: Int, seed: Long = 2024L): Seq[Txn] =
    (0 until days).flatMap(d => dayRows(start.plusDays(d), txPerDay, seed))

  /** The ingest-shaped DataFrame: all columns as strings, as a CSV read
    * with header and no inferSchema would yield. */
  val CsvSchema: StructType = StructType(Seq(
    "order_id", "order_date", "store_id", "store_city", "product",
    "quantity", "unit_price", "amount").map(StructField(_, StringType, true)))

  def asRawDf(spark: SparkSession, txns: Seq[Txn]): DataFrame = {
    import org.apache.spark.sql.Row
    val rowData = txns.map(t => Row(
      t.order_id, t.order_date, t.store_id, t.store_city, t.product,
      t.quantity.toString, f"${t.unit_price}%.2f", f"${t.amount}%.2f"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rowData, 4), CsvSchema)
  }

  /** One CSV file per day under `dir` (`retail_<date>.csv` like the
    * reference's layout). */
  def writeCsvDays(spark: SparkSession, dir: String, start: LocalDate,
                   days: Int, txPerDay: Int, seed: Long = 2024L): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    (0 until days).foreach { i =>
      val day = start.plusDays(i)
      val f = new java.io.File(d, s"retail_${day.toString}.csv")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try {
        w.println("order_id,order_date,store_id,store_city,product,quantity,unit_price,amount")
        dayRows(day, txPerDay, seed).foreach { t =>
          w.println(s"${t.order_id},${t.order_date},${t.store_id}," +
            s"${t.store_city},${t.product},${t.quantity}," +
            f"${t.unit_price}%.2f,${t.amount}%.2f")
        }
      } finally w.close()
    }
  }
}
