package graft.gen

import graft.stream.EventSchema

/** Retail transactions → event-stream JSON strings, the shape the
  * reference's Kafka producer emits (SURVEY.md §2.1 S9, §2.2 P16-P17):
  * keys/values trimmed, fully-empty rows skipped, and `event_time`
  * injected from the first present of order_ts/order_time/order_date/
  * timestamp (else the caller-supplied fallback — never wall-clock here,
  * determinism is part of the test contract).
  */
object EventJson {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** P16 + P17 + JSON encode for one record; None for all-blank rows. */
  def toJson(fields: Map[String, String],
             fallbackEventTime: String): Option[String] = {
    val trimmed = fields.collect {
      case (k, v) if k != null && v != null && v.trim.nonEmpty =>
        k.trim -> v.trim
    }
    if (trimmed.isEmpty) None
    else {
      val eventTime = Seq("order_ts", "order_time", "order_date", "timestamp")
        .collectFirst { case k if trimmed.contains(k) => trimmed(k) }
        .getOrElse(fallbackEventTime)
      val all = trimmed + ("event_time" -> eventTime)
      val obj = EventSchema.fields
        .flatMap(f => all.get(f).map(v => s""""${esc(f)}":"${esc(v)}""""))
        .mkString("{", ",", "}")
      Some(obj)
    }
  }

  /** A generated retail transaction as a stream event (amount plays
    * total_price; order_date is the event-time candidate). */
  def fromTxn(t: Retail.Txn): String =
    toJson(Map(
      "order_id" -> t.order_id,
      "order_date" -> t.order_date,
      "product" -> t.product,
      "quantity" -> t.quantity.toString,
      "unit_price" -> f"${t.unit_price}%.2f",
      "total_price" -> f"${t.amount}%.2f",
      "store" -> t.store_id),
      fallbackEventTime = t.order_date).get
}
