package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Exact distinct count over a dense non-negative integer key domain
  * via a mergeable bitmap — the TypedImperativeAggregate extension
  * point (the engine's fourth custom-extension kind, next to codegen'd
  * scalar Expressions, the RangeJoinRewrite optimizer rule, and
  * flatMapGroupsWithState streaming state).
  *
  * Why it earns custom code: `count(distinct x)` plans Expand +
  * a second shuffle keyed on (group, x) — the distinct values
  * themselves travel the wire. The bitmap buffer makes distinct-count
  * ALGEBRAIC for dense int keys: partial bitmaps build map-side, merge
  * by OR (order-independent, exactly mergeable — unlike HLL there is
  * ZERO error, and unlike sort-based distinct nothing is re-shuffled
  * but the fixed-size bitmaps). The classic warehouse trick for
  * user-id-shaped keys (dense surrogate ints); 10 M users = 1.25 MB
  * per group buffer. Keys must be in [0, 2^31-8); out-of-range input
  * fails fast rather than silently truncating.
  *
  * Order-independence makes it oracle-exact: the gate compares against
  * DuckDB's COUNT(DISTINCT) — any merge order yields the same bitmap.
  */
case class BitmapDistinctExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case x: Long => x
        case x: Int => x.toLong
        case x: Short => x.toLong
        case x: Byte => x.toLong
        case other => throw new IllegalArgumentException(
          s"bitmap_distinct requires an integral key, got ${other.getClass.getSimpleName}")
      }
      require(l >= 0 && l < Int.MaxValue - 8,
        s"bitmap_distinct requires keys in [0, 2^31-8): got $l")
      buffer.set(l.toInt)
    }
    buffer
  }

  override def merge(b: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    b.or(other); b
  }

  override def eval(b: java.util.BitSet): Any = b.cardinality().toLong

  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctExpr =
    copy(child = newChild)
}

/** Shared key coercion for the bitmap family: integral → bit index,
  * with the same fail-fast domain contract as [[BitmapDistinctExpr]]. */
private[functions] object BitmapKey {
  def set(buffer: java.util.BitSet, v: Any): Unit = {
    val l = v match {
      case x: Long => x
      case x: Int => x.toLong
      case x: Short => x.toLong
      case x: Byte => x.toLong
      case other => throw new IllegalArgumentException(
        s"bitmap aggregate requires an integral key, got ${other.getClass.getSimpleName}")
    }
    require(l >= 0 && l < Int.MaxValue - 8,
      s"bitmap aggregate requires keys in [0, 2^31-8): got $l")
    buffer.set(l.toInt)
  }
}

/** The SKETCH half of the bitmap roll-up pair: identical buffer
  * discipline to [[BitmapDistinctExpr]], but `eval` returns the
  * SERIALIZED bitmap (BinaryType) instead of its cardinality. This is
  * what makes distinct counts RE-AGGREGABLE: a warehouse materializes
  * one sketch per fine grain (day × type), and every coarser distinct
  * count — per day, per month, total — is a sketch MERGE over the tiny
  * sketch table, never a re-scan of the fact table. The exact-bitmap
  * version of the Druid / BigQuery `HLL_COUNT.INIT` → `MERGE` pattern
  * (with zero error, for dense int keys). Pair with
  * [[BitmapMergeCountExpr]].
  */
case class BitmapSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_sketch"

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) BitmapKey.set(buffer, v)
    buffer
  }

  override def merge(b: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    b.or(other); b
  }

  override def eval(b: java.util.BitSet): Any = b.toByteArray

  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapSketchExpr =
    copy(child = newChild)
}

/** The MERGE half of the bitmap roll-up pair: input rows are
  * serialized sketches ([[BitmapSketchExpr]] outputs); the aggregate
  * ORs them — order-independent, exactly mergeable — and returns the
  * merged cardinality. `bitmap_merge_count(sketch)` over a sketch
  * table IS `count(distinct key)` over the facts it summarized, at
  * sketch-table cost. Null sketches (e.g. from outer joins) are
  * ignored; a non-binary input fails fast.
  */
case class BitmapMergeCountExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge_count"

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.or(java.util.BitSet.valueOf(bytes)); buffer
      case other => throw new IllegalArgumentException(
        s"bitmap_merge_count requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    b.or(other); b
  }

  override def eval(b: java.util.BitSet): Any = b.cardinality().toLong

  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeCountExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeCountExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapMergeCountExpr =
    copy(child = newChild)
}

/** Scalar INTERSECTION count over two serialized sketches — the third
  * leg of the sketch algebra next to INIT ([[BitmapSketchExpr]]) and
  * MERGE/union ([[BitmapMergeCountExpr]]): `bitmap_and_count(a, b)` =
  * |A ∩ B| exactly. What it buys at 100 TB: overlap questions
  * (day-over-day retained users, audience intersections, cross-segment
  * reach) answered by a JOIN OF THE SKETCH TABLE with per-row bit
  * arithmetic — the fact table is never rescanned and no user id ever
  * re-shuffles. HLL sketches only estimate intersections (via
  * inclusion-exclusion, error compounds); exact bitmaps intersect
  * exactly. Null if either side is null (outer-join friendly). */
case class BitmapAndCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bitmap_and_count requires two BINARY sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitmapAndCountExpr.andCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  // real codegen (not CodegenFallback): the generated code calls the
  // same static helper eval uses, so interpreted and compiled paths
  // cannot diverge
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapAndCountExpr.andCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCountExpr =
    copy(left = newLeft, right = newRight)
}

object BitmapAndCountExpr {
  /** Shared by eval and generated code. */
  def andCount(l: Array[Byte], r: Array[Byte]): Long = {
    val a = java.util.BitSet.valueOf(l)
    a.and(java.util.BitSet.valueOf(r))
    a.cardinality().toLong
  }
}

object BitmapDistinct {
  /** Column-API entry point: `df.agg(bitmap_distinct($"user_id"))`. */
  def bitmap_distinct(c: Column): Column =
    ColumnBridge.column(
      BitmapDistinctExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `df.groupBy(grain).agg(bitmap_sketch($"user_id"))` — the
    * re-aggregable binary sketch. */
  def bitmap_sketch(c: Column): Column =
    ColumnBridge.column(
      BitmapSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(bitmap_merge_count($"sk"))` —
    * exact distinct count from merged sketches. */
  def bitmap_merge_count(c: Column): Column =
    ColumnBridge.column(
      BitmapMergeCountExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `bitmap_and_count($"sk_a", $"sk_b")` — exact |A ∩ B| of two
    * sketches, per row (overlap/retention from the sketch table). */
  def bitmap_and_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitmapAndCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
