package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join: for each left row, attach the single right row with
  * the greatest `rightTime <= leftTime`, matching on equi-keys.
  *
  * Re-expresses the reference's per-row "greatest year <= article year
  * within 10 back" quartile lookup (SD_Upd.py:89-98, IEEE_Upd.py:88-97)
  * as a distributed operator. Spark has no native as-of join; the naive
  * encoding (range join + window top-1) materializes every (left, right)
  * pair per key before pruning — O(n·m) per key, which dies at scale on
  * skewed keys.
  *
  * This implementation is the scalable union-merge form:
  *   1. tag left and right rows, union them (right payload nulled on
  *      left rows),
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, isRight desc, tieBreaker),
  *   3. last(payload, ignoreNulls) carries the most recent right payload
  *      forward onto each left row.
  *
  * The payload travels as ONE struct column (null on left rows, non-null
  * on every right row even when all its fields are null), so a single
  * `last(struct, ignoreNulls)` carries all fields atomically from the
  * same right row. Carrying each column independently would back-fill a
  * NULL field from an older right row, silently mixing rows.
  *
  * Cost: a single hash partition + sort per side — the same as any
  * sort-merge join — independent of how many right rows precede a left
  * row. Ties: right rows at the same timestamp as a left row ARE
  * visible (<= semantics); among equal right timestamps the greatest
  * `tieBreaker` wins.
  */
object AsOfJoin {

  /** @param left         left (probe) side
    * @param right        right (reference) side
    * @param keys         equi-join column names present on both sides
    * @param leftTime     event-time column on `left`
    * @param rightTime    event-time column on `right`
    * @param payloadCols  right columns to attach (aliased as-is)
    * @param tieBreaker   right column breaking equal-timestamp ties
    *                     (greatest wins); must be one of payloadCols or
    *                     rightTime
    * @param tolerance    optional MAX STALENESS (same units as the time
    *                     columns, which must be numeric when set): a
    *                     match older than `leftTime - tolerance` nulls
    *                     out — the feature-store "ASOF ... TOLERANCE"
    *                     rule (a stale feature is worse than no
    *                     feature). Since the carried match is the
    *                     LATEST right ≤ leftTime, it is out of
    *                     tolerance iff every earlier one is too, so the
    *                     post-carry test is exact and the plan shape is
    *                     unchanged: the matched right time rides inside
    *                     the payload struct through the same single
    *                     shuffle.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreaker: String,
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.intersect(leftCols)} collide with left side")
    require(!payloadCols.contains("__rt"),
      "payload column name __rt is reserved for the carried match time")
    tolerance.foreach { _ =>
      require(right.schema(rightTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tolerance requires a numeric time column, got ${right.schema(rightTime).dataType}")
    }
    val passthrough = leftCols.filterNot(c => keys.contains(c) || c == leftTime)

    // the matched right row's own time rides in the payload so the
    // staleness test can run AFTER the carry (and callers like
    // Quartiles can window on it)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)) :+
        right.schema(rightTime).copy(name = "__rt"))

    // A NULL rightTime can never satisfy `rightTime <= leftTime` (SQL
    // 3VL), but the asc sort puts NULLS FIRST: un-filtered, such a
    // row's payload would attach to every left row preceding the
    // first real right row. Drop them up front.
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__isRight"),
            col(tieBreaker).as("__tie"),
            struct(payloadCols.map(col) :+ col(rightTime).as("__rt"): _*)
              .as("__payload")) ++
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__isRight"),
            lit(null).cast(right.schema(tieBreaker).dataType).as("__tie"),
            lit(null).cast(payloadType).as("__payload")) ++
        passthrough.map(col): _*)

    // Right rows sort before left rows at the same timestamp so that a
    // right row with rightTime == leftTime is visible (<= semantics).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isRight").desc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      // staleness: null the WHOLE payload (atomically — field-wise
      // nulling would mix "no match" with "stale match" per column)
      .withColumn("__payload", tolerance match {
        case None => col("__payload")
        case Some(tol) =>
          when(col("__t") - col("__payload").getField("__rt") <= lit(tol),
            col("__payload"))
      })

    carried
      .filter(col("__isRight") === 0)
      .select(
        keys.map(col) ++
          Seq(col("__t").as(leftTime)) ++
          payloadCols.map(c => col("__payload").getField(c).as(c)) ++
          passthrough.map(col): _*)
  }
}
