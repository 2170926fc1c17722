package graft

import org.apache.spark.sql.functions._

import graft.gen.{EventJson, Retail}
import graft.stream.StreamingRevenue

class EventJsonSpec extends SparkSpec {
  import spark.implicits._

  test("P16: keys/values trimmed, blank rows skipped") {
    assert(EventJson.toJson(Map("  product " -> " Dosa "), "x")
      .exists(_.contains(""""product":"Dosa"""")))
    assert(EventJson.toJson(Map("product" -> "  ", "q" -> null), "x").isEmpty)
  }

  test("P17: event_time from first present candidate, else fallback") {
    val withTs = EventJson.toJson(
      Map("order_time" -> "2025-01-01 10:00:00", "product" -> "A"), "FB").get
    assert(withTs.contains(""""event_time":"2025-01-01 10:00:00""""))
    val without = EventJson.toJson(Map("product" -> "A"), "FB").get
    assert(without.contains(""""event_time":"FB""""))
  }

  test("generated events flow through the streaming decode + cleanse") {
    val txns = Retail.dayRows(java.time.LocalDate.of(2025, 3, 1), 20, 7L)
    val json = txns.map(EventJson.fromTxn)
    val df = json.toDF("value")
      .select(col("value").cast("binary").as("value"))
    val cleansed = StreamingRevenue.transformOrders(
      StreamingRevenue.decodeJson(df))
    val rows = cleansed.select("product", "line_amount").collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getString(0).nonEmpty && r.getDouble(1) > 0))
    val total = cleansed.agg(round(sum(col("line_amount")), 2))
      .collect().head.getDouble(0)
    val expected = math.rint(txns.map(_.amount).sum * 100) / 100
    assert(math.abs(total - expected) < 0.02)
  }
}
