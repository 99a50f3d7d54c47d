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

  /** EXACT bucket floor(x / w) as a column over a named temp, in pure
    * integer arithmetic. The earlier double form (`floor(v / w.toDouble)`)
    * mis-bucketed BIGINT values at/beyond 2^53 (doubles have 53
    * mantissa bits), silently dropping matches from the equi-join —
    * the same hazard [[graft.plans.RangeJoinRewrite.bucketOf]] fixes
    * at the optimizer level. `x - pmod(x, w)` wraps only below the
    * lowest full bucket boundary; those values are by definition in
    * bucket floor(MIN / w), a compile-time literal (under ANSI the
    * wrap would otherwise be a runtime ARITHMETIC_OVERFLOW). */
  private def withExactBucket(df: DataFrame, src: Column, out: String,
      w: Long): DataFrame = {
    val lowest = Math.floorDiv(Long.MinValue, w)
    val boundary = (lowest + 1L) * w // ∈ (MIN, MIN+w] — in range
    // the numerator must be guarded too: an unconditional projection
    // column evaluates for every row, wrap region included
    df.withColumn("_rj_num",
        when(src < lit(boundary), lit(0L))
          .otherwise(src - pmod(src, lit(w))))
      .withColumn(out,
        when(src < lit(boundary), lit(lowest))
          .otherwise(expr(s"_rj_num div CAST($w AS BIGINT)")))
      .drop("_rj_num")
  }

  /** Equi-join `points` to every interval containing them.
    * `points(pointCol)` and `intervals(loCol, hiCol)` are BIGINT;
    * intervals are half-open `[lo, hi)` and assumed NARROW relative
    * to `bucketWidth` (O(1) buckets each) — for arbitrary/sentinel
    * interval widths use the optimizer rule
    * [[graft.plans.RangeJoinRewrite]], which routes wide rows to a
    * bounded fallback. Output: point columns + interval columns,
    * exactly the naive-predicate join. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    // same contract Bloom.probe enforces on payload names: an input
    // column named like the bucketing internals would resolve
    // ambiguously and then be silently dropped with them
    val reserved = Seq("_rj_num", "_bl", "_bh", "_bkt")
    val clash = reserved.filter(c =>
      points.columns.contains(c) || intervals.columns.contains(c))
    require(clash.isEmpty,
      s"pointInInterval's internal columns $clash collide with input columns; rename them")
    // interval side: one row per overlapped bucket (small side only).
    // hi is exclusive, so the top bucket is bucket(hi - 1); the
    // hi = Long.MinValue guard keeps the decrement ANSI-safe (such an
    // interval is empty — the greatest() clamp plus residual filter
    // make its manufactured single bucket harmless).
    val lowest = Math.floorDiv(Long.MinValue, bucketWidth)
    val withBl = withExactBucket(intervals, col(loCol), "_bl", bucketWidth)
    val withBh = withExactBucket(withBl,
      when(col(hiCol) <= lit(Long.MinValue), col(hiCol))
        .otherwise(col(hiCol) - lit(1L)), "_bh", bucketWidth)
    val spans = withBh
      .withColumn("_bkt", explode(sequence(col("_bl"),
        greatest(col("_bh"), col("_bl")))))
      .drop("_bl", "_bh")
    withExactBucket(points, col(pointCol), "_bkt", bucketWidth)
      .join(spans, Seq("_bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bkt")
  }

  /** Interval × interval OVERLAP join: every `(left, right)` pair whose
    * half-open intervals `[lLo, lHi) ∩ [rLo, rHi)` is non-empty —
    * `greatest(lo) < least(hi)`, the temporal/genomic overlap-join
    * predicate. Same nested-loop trap as [[pointInInterval]], same
    * bucket-decomposition fix, with one extra wrinkle: BOTH sides
    * explode to their overlapped buckets, so a wide pair can meet in
    * several buckets. Instead of a post-join `distinct` (a second
    * corpus-wide shuffle), each pair is emitted exactly once at its
    * CANONICAL bucket — the bucket containing `greatest(lLo, rLo)`,
    * the intersection's first point, which both sides' explosions are
    * guaranteed to cover whenever the pair overlaps at all. Empty
    * intervals (`lo >= hi`) match nothing, exactly like the naive
    * predicate. Pick `bucketWidth` near the typical span of the WIDER
    * side so rows explode to O(1) buckets each.
    *
    * Input column sets must be disjoint (the output carries both). */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Long): DataFrame = {
    val reserved = Seq("_rj_num", "_bl", "_bh", "_bkt", "_ov_g", "_ov_cb")
    val clash = reserved.filter(c =>
      left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty,
      s"intervalOverlap's internal columns $clash collide with input columns; rename them")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlap inputs share column names $shared; rename one side")
    def spans(df: DataFrame, lo: String, hi: String): DataFrame = {
      val withBl = withExactBucket(df, col(lo), "_bl", bucketWidth)
      val withBh = withExactBucket(withBl,
        when(col(hi) <= lit(Long.MinValue), col(hi))
          .otherwise(col(hi) - lit(1L)), "_bh", bucketWidth)
      withBh
        .withColumn("_bkt", explode(sequence(col("_bl"),
          greatest(col("_bh"), col("_bl")))))
        .drop("_bl", "_bh")
    }
    val joined = spans(left, lLoCol, lHiCol)
      .join(spans(right, rLoCol, rHiCol), Seq("_bkt"))
    withExactBucket(
        joined.withColumn("_ov_g", greatest(col(lLoCol), col(rLoCol))),
        col("_ov_g"), "_ov_cb", bucketWidth)
      .filter(col("_ov_g") < least(col(lHiCol), col(rHiCol)))
      .filter(col("_bkt") === col("_ov_cb"))
      .drop("_bkt", "_ov_g", "_ov_cb")
  }
}
