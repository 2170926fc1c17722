package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history building: turn a
  * change-event stream (key, ts, attributes) into validity intervals
  * [valid_from, valid_to) with an is_current flag — the standard
  * warehouse pattern for "what did this dimension row look like at
  * time t", and the batch half of a CDC ingestion pipeline.
  *
  * Scale shape: both passes (change-collapse, interval stitching) are
  * windows over the SAME (key, order) partitioning, so the plan pays
  * one exchange on the dimension key; per-key state inside the window
  * is O(1) (lag/lead of one row), never a collected history. Dimension
  * change streams are key-skew-friendly by nature (a hot entity's
  * history sorts within one partition), and a pathological hot key is
  * pre-split upstream like any other skewed window input.
  */
object Scd {

  /** Collapse consecutive no-change events and emit SCD2 intervals.
    *
    * A change event opens a new interval only when `attrCol` differs
    * from the key's previous event (idempotent re-deliveries and
    * no-op updates collapse away — CDC streams are full of both). Each
    * surviving change's interval runs to the NEXT surviving change's
    * timestamp, the last one is open (`valid_to` null, is_current 1).
    * `tieCol` breaks exact-timestamp ties deterministically.
    *
    * Emits (key, attr, valid_from, valid_to, is_current) with the
    * validity bounds in floored epoch seconds (cross-engine stable);
    * ordering inside the window uses the raw timestamp. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           attrCol: String, tieCol: String): DataFrame = {
    val ord: Seq[Column] = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    // null-SAFE change detection: lag(attr) is null both for a key's
    // first event and after a null attribute value, so "first row" is
    // detected positionally (row_number, riding the same exchange) and
    // the comparison is <=> — a transition to/from NULL opens an
    // interval and runs of NULLs collapse like any other value
    val surviving = changes
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attrCol)))
    // the filter preserves the (key, ts) clustering, so this second
    // window rides the same exchange
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    surviving
      .withColumn("valid_from",
        floor(unix_timestamp(col(tsCol))).cast("long"))
      .withColumn("valid_to",
        floor(unix_timestamp(lead(col(tsCol), 1).over(w2))).cast("long"))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col(keyCol), col(attrCol).as("attr"), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** Time-travel read of an SCD2 history: the dimension rows valid at
    * instant `at` — valid_from ≤ at < valid_to, with the open current
    * interval (null valid_to) always matching. `at` is a 1-row frame
    * (column `at`, epoch seconds) so a data-derived instant never
    * round-trips through the driver; it broadcasts into a map-side
    * filter — no shuffle on the history. LEFT join per the repo's
    * single-row-broadcast convention (an empty `at` frame yields a null
    * instant and an empty result, instead of annihilating the probe
    * side mid-plan the way a crossJoin against zero build rows does —
    * cf. the BPE empty-merge lesson in NOTES.md). */
  def asOf(history: DataFrame, at: DataFrame): DataFrame =
    history.join(broadcast(at.limit(1)), lit(true), "left")
      .filter(col("valid_from") <= col("at") &&
        (col("valid_to").isNull || col("at") < col("valid_to")))
      .drop("at")

  /** CDC merge-apply (the MERGE INTO / upsert primitive): fold a batch
    * of keyed change events — inserts/updates ('U') and deletes ('D'),
    * ordered by `seqCol` — into a base snapshot, producing the next
    * snapshot. Where [[scd2]] KEEPS history, this applies it: the
    * nightly "apply the day's CDC feed to the dimension" step every
    * warehouse pipeline has. Per key, only the LATEST change decides,
    * under a TOTAL order that is a pure function of the data: max
    * seqCol, ties broken by preferring 'D', then the op string, then
    * the payload values themselves (field by field, nulls smallest) —
    * so equal-seq same-op duplicates with different payloads resolve
    * deterministically instead of by partition arrival order. Latest
    * 'U' upserts the row's payload columns, latest 'D' removes the
    * key; keys untouched by the batch pass through unchanged. An
    * 'earlier U, later D' sequence deletes — order within the batch
    * matters and is honored.
    *
    * Columns: `payloadCols` are the attribute columns carried by both
    * the base and the changes; the output schema is (key, payload...).
    *
    * Scale: one max_by aggregate contracts the change batch to one row
    * per touched key (map-side partial), then ONE full-outer join on
    * the key. The base never shuffles more than once, and a typical
    * changes-≪-base batch broadcasts (AQE decides from measured size —
    * no hint, since a backfill batch can exceed the base). */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCol: String,
               seqCol: String, opCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(
        struct((col(opCol).as("_op") +:
          payloadCols.map(c => col(c).as(s"_p_$c"))): _*),
        // 'D' sorts above 'U' at equal seq: a delete observed at the
        // same sequence number as an update must win deterministically;
        // payload values are the FINAL tiebreak (nulls smallest — the
        // oracle mirrors with DESC NULLS LAST) so equal-seq same-op
        // duplicates can't resolve by partition arrival order
        struct((col(seqCol).as("_s") +:
          (col(opCol) === "D").cast("int").as("_d") +:
          col(opCol).as("_o") +:
          payloadCols.zipWithIndex.map { case (c, i) =>
            col(c).as(s"_t$i") }): _*))
        .as("_ch"))
      .select(col(keyCol) +: col("_ch._op").as("_op") +:
        payloadCols.map(c => col(s"_ch._p_$c").as(s"_c_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c =>
        when(col("_op").isNotNull, col(s"_c_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
