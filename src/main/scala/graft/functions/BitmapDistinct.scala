package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Exact distinct count over ANY 64-bit integral key domain via a
  * mergeable compressed bitmap ([[Bitmap64]]) — the
  * TypedImperativeAggregate extension point (the engine's fourth
  * custom-extension kind, next to codegen'd scalar Expressions, the
  * RangeJoinRewrite optimizer rule, and flatMapGroupsWithState
  * streaming state).
  *
  * Why it earns custom code: `count(distinct x)` plans Expand +
  * a second shuffle keyed on (group, x) — the distinct values
  * themselves travel the wire. The bitmap buffer makes distinct-count
  * ALGEBRAIC: partial bitmaps build map-side, merge by OR
  * (order-independent, exactly mergeable — unlike HLL there is ZERO
  * error, and unlike sort-based distinct nothing is re-shuffled but
  * the compressed bitmaps). Dense surrogate-int keys pay the classic
  * 1 bit/key (10 M users ≈ 1.25 MB per group buffer); sparse 64-bit
  * snowflake ids, hashes, and dictionary codes pay ~2 bytes/key via
  * roaring-style array containers — the r9 dense-domain `require` is
  * gone, every Long (negatives included) is a legal key.
  *
  * Order-independence makes it oracle-exact: the gate compares against
  * DuckDB's COUNT(DISTINCT) — any merge order yields the same bitmap.
  */
case class BitmapDistinctExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  // analysis-time contract (not a mid-job IllegalArgumentException): a
  // mistyped key column fails the query before any task launches
  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkIntegral(prettyName, child.dataType)

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64()

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    val v = child.eval(input)
    if (v != null) buffer.add(BitmapKey.toLong(v))
    buffer
  }

  override def merge(b: Bitmap64, other: Bitmap64): Bitmap64 = {
    b.or(other); b
  }

  override def eval(b: Bitmap64): Any = b.cardinality

  override def serialize(b: Bitmap64): Array[Byte] = b.serialize()

  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctExpr =
    copy(child = newChild)
}

/** Shared key handling for the bitmap family: integral → 64-bit key
  * (any value — the compressed containers make sparse and negative
  * domains cheap), plus the analysis-time type check every member
  * mounts. */
private[functions] object BitmapKey {
  def toLong(v: Any): Long = v match {
    case x: Long => x
    case x: Int => x.toLong
    case x: Short => x.toLong
    case x: Byte => x.toLong
    case other => throw new IllegalArgumentException(
      s"bitmap aggregate requires an integral key, got ${other.getClass.getSimpleName}")
  }

  private val integral: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  def checkIntegral(fn: String, dt: DataType): TypeCheckResult =
    if (integral.contains(dt)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires an integral key column (TINYINT/SMALLINT/INT/BIGINT), " +
        s"got ${dt.simpleString}")

  def checkBinary(fn: String, dt: DataType): TypeCheckResult =
    if (dt == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires a BINARY sketch column, got ${dt.simpleString}")
}

/** The SKETCH half of the bitmap roll-up pair: identical buffer
  * discipline to [[BitmapDistinctExpr]], but `eval` returns the
  * SERIALIZED bitmap (BinaryType) instead of its cardinality. This is
  * what makes distinct counts RE-AGGREGABLE: a warehouse materializes
  * one sketch per fine grain (day × type), and every coarser distinct
  * count — per day, per month, total — is a sketch MERGE over the tiny
  * sketch table, never a re-scan of the fact table. The exact-bitmap
  * version of the Druid / BigQuery `HLL_COUNT.INIT` → `MERGE` pattern
  * (with zero error, over any 64-bit integral key domain). The bytes
  * are CANONICAL — a pure function of the key set, independent of
  * merge order and partitioning ([[Bitmap64.serialize]]) — so sketch
  * columns can themselves be compared or grouped. Pair with
  * [[BitmapMergeCountExpr]].
  */
case class BitmapSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkIntegral(prettyName, child.dataType)

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64()

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    val v = child.eval(input)
    if (v != null) buffer.add(BitmapKey.toLong(v))
    buffer
  }

  override def merge(b: Bitmap64, other: Bitmap64): Bitmap64 = {
    b.or(other); b
  }

  override def eval(b: Bitmap64): Any = b.serialize()

  override def serialize(b: Bitmap64): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

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
  * ignored; a non-binary input fails at ANALYSIS (checkInputDataTypes),
  * not mid-job.
  */
case class BitmapMergeCountExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge_count"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64()

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.or(Bitmap64.deserialize(bytes)); buffer
      case other => throw new IllegalArgumentException(
        s"bitmap_merge_count requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Bitmap64, other: Bitmap64): Bitmap64 = {
    b.or(other); b
  }

  override def eval(b: Bitmap64): Any = b.cardinality

  override def serialize(b: Bitmap64): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeCountExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeCountExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapMergeCountExpr =
    copy(child = newChild)
}

/** Sketch → SKETCH re-aggregation — the leg that lets a warehouse
  * MAINTAIN coarser stored sketch tables from finer ones: daily
  * sketches roll into STORED monthly sketches (this aggregate), and
  * ad-hoc queries then merge-count over months without ever touching
  * days again — each level of the roll-up hierarchy is built from the
  * one below, the fact table scanned exactly once ever. eval returns
  * the OR-merged bitmap's canonical bytes, so a stored roll-up is
  * byte-identical to a sketch built directly from the facts (spec-
  * pinned) — intermediate tiers leak nothing about the tree shape. */
case class BitmapMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap64]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64()

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.or(Bitmap64.deserialize(bytes)); buffer
      case other => throw new IllegalArgumentException(
        s"bitmap_merge_sketch requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Bitmap64, other: Bitmap64): Bitmap64 = {
    b.or(other); b
  }

  override def eval(b: Bitmap64): Any = b.serialize()

  override def serialize(b: Bitmap64): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapMergeSketchExpr =
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
  * exactly — and [[Bitmap64.andCardinality]] never materializes the
  * intersection, it counts straight off co-resident containers. Null
  * if either side is null (outer-join friendly). */
case class BitmapAndCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
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
  def andCount(l: Array[Byte], r: Array[Byte]): Long =
    Bitmap64.andCardinality(Bitmap64.deserialize(l), Bitmap64.deserialize(r))
}

/** Scalar SET-DIFFERENCE count over two serialized sketches — the leg
  * that completes the exact audience algebra: union is MERGE
  * ([[BitmapMergeCountExpr]]), intersection is
  * [[BitmapAndCountExpr]], and `bitmap_andnot_count(a, b)` = |A \ B|
  * exactly — new-user / churned-user questions (today's audience MINUS
  * yesterday's, a segment minus a suppression list) answered from the
  * sketch table with per-row bit arithmetic, the fact table never
  * rescanned. Implemented as the identity |A| − |A ∩ B|
  * ([[Bitmap64.andNotCardinality]]) — exact, non-materializing, and no
  * new container kernel to keep canonical. Null if either side is
  * null (outer-join friendly). */
case class BitmapAndNotCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_andnot_count requires two BINARY sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_andnot_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitmapAndNotCountExpr.andNotCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  // real codegen (not CodegenFallback): the generated code calls the
  // same static helper eval uses, so interpreted and compiled paths
  // cannot diverge
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapAndNotCountExpr.andNotCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndNotCountExpr =
    copy(left = newLeft, right = newRight)
}

object BitmapAndNotCountExpr {
  /** Shared by eval and generated code. */
  def andNotCount(l: Array[Byte], r: Array[Byte]): Long =
    Bitmap64.andNotCardinality(Bitmap64.deserialize(l), Bitmap64.deserialize(r))
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

  /** `bitmap_andnot_count($"sk_a", $"sk_b")` — exact |A \ B| of two
    * sketches, per row (new/churned audiences from the sketch table). */
  def bitmap_andnot_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitmapAndNotCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `daily.groupBy(month).agg(bitmap_merge_sketch($"sk"))` — roll
    * fine sketches into a STORED coarser sketch table (bytes identical
    * to sketching the facts directly). */
  def bitmap_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      BitmapMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())
}
