package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Left as-of join: for each left row, attach the single right row with
  * the greatest `rightTime <= leftTime` (direction "backward", the
  * default), the least `rightTime >= leftTime` ("forward"), or the
  * closest in either direction ([[nearestAsOf]]), matching on equi-keys.
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
  *      (time, isRight desc, tieBreaker) — time descending for the
  *      forward direction,
  *   3. last(payload, ignoreNulls) carries the nearest right payload
  *      in the chosen direction onto each left row.
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
  * visible (<= / >= semantics); among equal right timestamps the
  * greatest `tieBreaker` wins backward, the LEAST wins forward (the
  * "first row in scan direction" rule).
  */
object AsOfJoin {

  /** Tagged union of both sides — the shared step-1 of every direction.
    * Output columns: keys ++ (__t, __isRight, __tie, __payload) ++
    * left passthrough columns (null on right rows). */
  private def tagUnion(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreaker: String): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.intersect(leftCols)} collide with left side")
    require(!payloadCols.contains("__rt"),
      "payload column name __rt is reserved for the carried match time")
    val passthrough = leftCols.filterNot(c => keys.contains(c) || c == leftTime)

    // the matched right row's own time rides in the payload so the
    // staleness test can run AFTER the carry (and callers like
    // Quartiles can window on it)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)) :+
        right.schema(rightTime).copy(name = "__rt"))

    // A NULL rightTime can never satisfy the as-of inequality (SQL
    // 3VL), but a sort would place it at one end: un-filtered, such a
    // row's payload would attach to the left rows beyond the last real
    // right row. Drop them up front.
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

    (taggedRight.unionByName(taggedLeft), passthrough)
  }

  /** The carry window for one direction. Right rows sort before left
    * rows at the same timestamp so that a right row with
    * rightTime == leftTime is visible in BOTH directions. */
  private def carryWindow(keys: Seq[String], backward: Boolean): WindowSpec = {
    // Null placement is load-bearing in BOTH directions. __t: a left
    // row with a NULL time can match nothing (3VL), so it must lead
    // the scan — asc does that by default (nulls first); desc needs
    // the explicit nulls_first or such rows would trail every right
    // row and soak up a spurious match. __tie: a NULL tie-breaker must
    // LOSE among equal-timestamp right rows (mirroring the oracles'
    // NULLS-LAST rank order), so it leads the scan and a real tie is
    // carried over it — nulls_first on both directions.
    val order =
      if (backward) Seq(col("__t").asc, col("__isRight").desc, col("__tie").asc_nulls_first)
      else Seq(col("__t").desc_nulls_first, col("__isRight").desc, col("__tie").desc_nulls_first)
    Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** Directed staleness of a carried payload: how far the match is from
    * the left row against the scan direction (backward: how old;
    * forward: how far ahead). */
  private def staleness(payload: Column, backward: Boolean): Column =
    if (backward) col("__t") - payload.getField("__rt")
    else payload.getField("__rt") - col("__t")

  private def finalSelect(carried: DataFrame, keys: Seq[String],
      leftTime: String, payloadCols: Seq[String], passthrough: Seq[String],
      payload: Column): DataFrame =
    carried
      .filter(col("__isRight") === 0)
      .select(
        keys.map(col) ++
          Seq(col("__t").as(leftTime)) ++
          payloadCols.map(c => payload.getField(c).as(c)) ++
          passthrough.map(col): _*)

  /** @param left         left (probe) side
    * @param right        right (reference) side
    * @param keys         equi-join column names present on both sides
    * @param leftTime     event-time column on `left`
    * @param rightTime    event-time column on `right`
    * @param payloadCols  right columns to attach (aliased as-is)
    * @param tieBreaker   right column breaking equal-timestamp ties
    *                     (greatest wins backward, least wins forward;
    *                     a NULL tie-breaker always loses to a non-null
    *                     one). Any right column works — it rides the
    *                     sort as its own tagged column, independent of
    *                     payloadCols
    * @param tolerance    optional MAX STALENESS (same units as the time
    *                     columns, which must be numeric when set): a
    *                     match farther than `tolerance` from `leftTime`
    *                     against the direction nulls out — the
    *                     feature-store "ASOF ... TOLERANCE" rule (a
    *                     stale feature is worse than no feature). Since
    *                     the carried match is the nearest one in the
    *                     direction, it is out of tolerance iff every
    *                     farther one is too, so the post-carry test is
    *                     exact and the plan shape is unchanged: the
    *                     matched right time rides inside the payload
    *                     struct through the same single shuffle.
    * @param direction    "backward" (default; greatest rightTime <=
    *                     leftTime) or "forward" (least rightTime >=
    *                     leftTime — the pandas merge_asof direction
    *                     surface)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreaker: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val backward = direction == "backward"
    tolerance.foreach { _ =>
      require(right.schema(rightTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tolerance requires a numeric time column, got ${right.schema(rightTime).dataType}")
    }
    val (tagged, passthrough) =
      tagUnion(left, right, keys, leftTime, rightTime, payloadCols, tieBreaker)

    val carried = tagged
      .withColumn("__payload",
        last(col("__payload"), ignoreNulls = true).over(carryWindow(keys, backward)))
      // staleness: null the WHOLE payload (atomically — field-wise
      // nulling would mix "no match" with "stale match" per column)
      .withColumn("__payload", tolerance match {
        case None => col("__payload")
        case Some(tol) =>
          when(staleness(col("__payload"), backward) <= lit(tol), col("__payload"))
      })

    finalSelect(carried, keys, leftTime, payloadCols, passthrough, col("__payload"))
  }

  /** Nearest as-of: for each left row, the right row minimizing
    * `|rightTime - leftTime|`; an exact tie in distance prefers the
    * BACKWARD match (the at-or-before row). Both time columns must be
    * numeric (the distance comparison is arithmetic).
    *
    * Plan shape: the same single tagged union and ONE hash partition,
    * with TWO window sorts over it (one per scan direction) — the
    * winner is picked per row by comparing the two carried deltas, so
    * no pair space and no second shuffle exist. With `tolerance`, a
    * winner farther than `tolerance` nulls out; picking the closer
    * match FIRST and testing tolerance after is exact, because if the
    * closer match is out of tolerance the farther one is too. */
  def nearestAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      tieBreaker: String,
      tolerance: Option[Long] = None): DataFrame = {
    Seq(left.schema(leftTime).dataType, right.schema(rightTime).dataType).foreach { t =>
      require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"nearestAsOf requires numeric time columns, got $t")
    }
    val (tagged, passthrough) =
      tagUnion(left, right, keys, leftTime, rightTime, payloadCols, tieBreaker)

    val b = last(col("__payload"), ignoreNulls = true).over(carryWindow(keys, backward = true))
    val f = last(col("__payload"), ignoreNulls = true).over(carryWindow(keys, backward = false))
    val carried = tagged
      .withColumn("__pB", b)
      .withColumn("__pF", f)
      .withColumn("__chosen",
        when(col("__pB").isNull, col("__pF"))
          .when(col("__pF").isNull, col("__pB"))
          // strict <: an equidistant pair keeps the backward match
          .when(staleness(col("__pF"), backward = false) <
                  staleness(col("__pB"), backward = true), col("__pF"))
          .otherwise(col("__pB")))
      .withColumn("__chosen", tolerance match {
        case None => col("__chosen")
        case Some(tol) =>
          when(abs(col("__t") - col("__chosen").getField("__rt")) <= lit(tol),
            col("__chosen"))
      })

    finalSelect(carried, keys, leftTime, payloadCols, passthrough, col("__chosen"))
  }
}
