package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference pipeline's cleansing layer, re-expressed as composable
  * `DataFrame => DataFrame` transforms (use with `df.transform(...)`).
  *
  * Semantics replicated from the reference (see SURVEY.md §2.2):
  *  - P1  column-name normalization          (pipeline_batch.py:131-132)
  *  - P2  candidate-column product resolve   (pipeline_batch.py:134-140)
  *  - P3  date parsing cascade               (pipeline_batch.py:152-171)
  *  - P4  timestamp parsing cascade          (streaming_sales_aggregator.py:225-238)
  *  - P5  missing-timestamp epoch default    (streaming_sales_aggregator.py:222-223)
  *  - P7  numeric casts via try_cast         (pipeline_batch.py:184,189-191)
  *  - P8  derived amount                     (pipeline_batch.py:179-194)
  *  - P9  null-to-zero + round(2), STREAM ONLY (streaming_sales_aggregator.py:255-261;
 *        the batch path instead drops null amounts, pipeline_batch.py:196-198)
  *  - P10 blank-product repair → UNKNOWN     (pipeline_batch.py:199-202)
  *  - P11-P13 invalid-row filters            (pipeline_batch.py:173-177,197)
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (zero UDFs), so the whole cascade stays inside WholeStageCodegen and
  * Catalyst can still push the surviving filters into the scan. Dropped-row
  * accounting uses `observe()` instead of the reference's extra `count()`
  * jobs — same observable semantics, one pass instead of three.
  */
object Cleansing {

  /** P1: lowercase + trim every column name. */
  def normalizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase.trim): _*)

  /** First column (by normalized name) present in `df` out of `candidates`.
    * Driver-side schema introspection only — no data pass. */
  def resolveFirst(df: DataFrame, candidates: Seq[String]): Option[String] = {
    val have = df.columns.map(c => c.toLowerCase.trim -> c).toMap
    candidates.collectFirst { case c if have.contains(c) => have(c) }
  }

  /** Batch product-candidate order (pipeline_batch.py:134-140). */
  val ProductCandidates: Seq[String] = Seq("product", "item")
  /** Batch date-candidate order (pipeline_batch.py:143-150). */
  val DateCandidates: Seq[String] =
    Seq("order_date", "date", "order_time", "timestamp", "event_time")
  /** Stream timestamp-candidate order (streaming_sales_aggregator.py:215-221). */
  val StreamTsCandidates: Seq[String] =
    Seq("event_time", "order_time", "order_date", "timestamp")
  /** Price-candidate order (pipeline_batch.py:186). */
  val PriceCandidates: Seq[String] = Seq("unit_price", "price")

  /** P2 + P10: `product` = trimmed first-present candidate, blank/null → UNKNOWN. */
  def withProduct(df: DataFrame, candidates: Seq[String] = ProductCandidates): DataFrame = {
    val raw: Column = resolveFirst(df, candidates) match {
      case Some(c) => trim(col(c))
      case None    => lit("UNKNOWN")
    }
    df.withColumn(
      "product",
      when(raw.isNull || raw === "", lit("UNKNOWN")).otherwise(raw))
  }

  /** P3: the reference's three-step date cascade applied to one column:
    * timestamp-parse → date-parse → `yyyyMMdd` regex. Unparseable → null.
    * Spark 4 defaults to ANSI mode where to_date/to_timestamp THROW on
    * malformed input; the reference's contract is bad → null → filtered,
    * so every parse here is a try_* variant regardless of session conf. */
  def dateCascade(c: Column): Column = coalesce(
    to_date(c.try_cast("timestamp")),
    c.try_cast("date"),
    try_to_timestamp(
      regexp_extract(c.cast("string"), "^(\\d{8})", 1), lit("yyyyMMdd"))
      .cast("date"))

  /** P3 applied to the first present date candidate → `order_date`. */
  def withOrderDate(df: DataFrame, candidates: Seq[String] = DateCandidates): DataFrame =
    resolveFirst(df, candidates) match {
      case Some(c) => df.withColumn("order_date", dateCascade(col(c)))
      case None    => df.withColumn("order_date", lit(null).cast("date"))
    }

  /** P4: streaming timestamp cascade — the reference tries the bare value,
    * a `T`→space rewrite, then explicit formats; each attempt yields null on
    * failure (streaming_sales_aggregator.py:225-238). */
  def timestampCascade(c: Column): Column = {
    val s = c.cast("string")
    coalesce(
      s.try_cast("timestamp"),
      try_to_timestamp(regexp_replace(s, "T", " ")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd")))
  }

  /** P4 + P5: `order_ts` from the first present stream candidate; if no
    * candidate column exists at all, the epoch default (later filtered). */
  def withOrderTs(df: DataFrame, candidates: Seq[String] = StreamTsCandidates): DataFrame =
    resolveFirst(df, candidates) match {
      case Some(c) => df.withColumn("order_ts", timestampCascade(col(c)))
      case None    =>
        df.withColumn("order_ts", to_timestamp(lit("1970-01-01 00:00:00")))
    }

  /** P7 + P8 (batch): `amount` = provided amount, else quantity×price,
    * else literal 0.0 when no amount-bearing column exists at all; bad
    * numerics → null via try_cast and STAY null (pipeline_batch.py:196
    * filters `amount.isNotNull` before rounding — unparseable amounts
    * drop the row; null→0.0 belongs only to the streaming path, P9).
    * round(2) of null is null, so rounding here commutes with the
    * downstream filter. */
  def withAmount(df: DataFrame): DataFrame = {
    val qty = resolveFirst(df, Seq("quantity"))
    val price = resolveFirst(df, PriceCandidates)
    val base: Column = resolveFirst(df, Seq("amount")) match {
      case Some(a) => col(a).try_cast("double")
      case None =>
        (qty, price) match {
          case (Some(q), Some(p)) =>
            col(q).try_cast("double") * col(p).try_cast("double")
          case _ => lit(0.0)
        }
    }
    df.withColumn("amount", round(base, 2))
  }

  /** P8 + P9 streaming variant: prefer total_price, else
    * quantity×unit_price, null → 0.0
    * (streaming_sales_aggregator.py:244-261). The reference's plain
    * `.cast(double)` runs under Spark 3.5's non-ANSI default, where a
    * malformed numeric yields null; Spark 4 defaults ANSI ON and the
    * same cast would throw CAST_INVALID_INPUT and kill the streaming
    * query, so `try_cast` is the semantic-preserving translation. */
  def withLineAmount(df: DataFrame): DataFrame = {
    val tp = resolveFirst(df, Seq("total_price")).map(col(_).try_cast("double"))
    val q  = resolveFirst(df, Seq("quantity")).map(col(_).try_cast("double"))
    val up = resolveFirst(df, Seq("unit_price")).map(col(_).try_cast("double"))
    val derived: Column = (q, up) match {
      case (Some(qc), Some(pc)) => qc * pc
      case _                    => lit(null).cast(DoubleType)
    }
    val amt = tp match {
      case Some(t) => when(t.isNotNull, t).otherwise(derived)
      case None    => derived
    }
    df.withColumn("line_amount",
      round(when(amt.isNull, 0.0).otherwise(amt), 2))
  }

  /** Full batch cleanse: P1 → P2/P10 → P3 → P7-P9 → filters P11+P13.
    * Rows dropped for an unparseable date are counted via `observe`
    * (metric `invalid_dates`) rather than a separate count() job. */
  def cleanseBatch(df: DataFrame): DataFrame = {
    val staged = df
      .transform(normalizeColumnNames)
      .transform(withProduct(_))
      .transform(withOrderDate(_))
      .transform(withAmount)
    staged
      .observe("cleansing",
        count(when(col("order_date").isNull, 1)).as("invalid_dates"))
      .filter(col("order_date").isNotNull)
      .filter(col("amount").isNotNull)
  }

  /** Full streaming-shape cleanse: P2 → P4/P5 → P6 → P8/P9 → P12.
    * Dropped-row accounting mirrors the batch path's `observe` (the
    * reference logs the drop count, streaming_sales_aggregator.py:241);
    * observed metrics surface per micro-batch via the streaming
    * listener, with no extra pass. */
  def cleanseStream(df: DataFrame): DataFrame = df
    .transform(normalizeColumnNames)
    .transform(withProduct(_))
    .transform(withOrderTs(_))
    .withColumn("order_date", to_date(col("order_ts")))
    .transform(withLineAmount)
    .observe("cleansing_stream",
      count(when(col("order_ts").isNull, 1)).as("invalid_ts"))
    .filter(col("order_ts").isNotNull)
}
