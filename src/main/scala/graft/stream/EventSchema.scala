package graft.stream

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The event-stream wire schema: 12 nullable string fields, exactly the
  * reference's permissive Kafka JSON contract
  * (streaming_sales_aggregator.py:187-200) — every field arrives as a
  * nullable string and is cast downstream; unknown JSON fields are
  * dropped, missing ones become null.
  */
object EventSchema {
  val fields: Seq[String] = Seq(
    "order_id", "order_date", "order_time", "event_time", "timestamp",
    "product", "item", "quantity", "unit_price", "total_price",
    "customer_id", "store")

  val schema: StructType =
    StructType(fields.map(StructField(_, StringType, nullable = true)))
}
