package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) without the nested-loop trap.
  *
  * Spark has no native range-join operator: `points JOIN intervals ON
  * p >= lo AND p < hi` has no equi-key, so Catalyst falls back to
  * BroadcastNestedLoopJoin — |points|·|intervals| comparisons, the
  * classic 100 TB killer (a 1B-point × 10k-interval join is 10^13
  * comparisons). The standard fix, used here: decompose the range
  * predicate into an equi-join on coarse BUCKETS plus a residual
  * filter. Each interval is exploded to the buckets it overlaps
  * (span/width rows — interval side only, assumed the small side);
  * each point maps to exactly ONE bucket (no fan-out of the big
  * side). The bucket equi-join shuffles/broadcasts like any hash
  * join, and the residual `p >= lo AND p < hi` filter runs inside
  * the join — so the work is |points| + Σ overlaps instead of the
  * cross product. Pick `bucketWidth` near the typical interval span
  * so intervals explode to O(1) buckets each.
  *
  * Overlapping intervals are legal: a point matches every interval
  * containing it, exactly like the naive predicate.
  */
object RangeJoin {

  private def bucketOf(v: Column, width: Long): Column =
    floor(v / lit(width.toDouble)).cast("long")

  /** Equi-join `points` to every interval containing them.
    * `points(pointCol)` and `intervals(loCol, hiCol)` are numeric;
    * intervals are half-open `[lo, hi)`. Output: point columns +
    * interval columns, exactly the naive-predicate join. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    // interval side: one row per overlapped bucket (small side only)
    val spans = intervals.withColumn("_bkt",
      explode(sequence(bucketOf(col(loCol), bucketWidth),
        // hi is exclusive: the bucket of hi-epsilon, not of hi itself
        greatest(bucketOf(col(hiCol), bucketWidth) -
          when(pmod(col(hiCol), lit(bucketWidth.toDouble)) === 0.0, 1L).otherwise(0L),
          bucketOf(col(loCol), bucketWidth)))))
    points
      .withColumn("_bkt", bucketOf(col(pointCol), bucketWidth))
      .join(spans, Seq("_bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bkt")
  }
}
