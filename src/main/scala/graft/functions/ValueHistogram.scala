package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** EXACT mergeable quantiles over integral value domains — the
  * QUANTILE leg of the sketch algebra, next to the exact-distinct
  * bitmap pair ([[BitmapSketchExpr]]/[[BitmapMergeCountExpr]]) and the
  * approximate HLL twin: a value → count histogram whose merge is
  * count ADDITION (associative, commutative — order-independent), so a
  * warehouse materializes one sketch per fine grain (day × type) and
  * answers ANY quantile at ANY coarser grain from the sketch table —
  * P99 per day, per month, per everything — without rescanning facts,
  * with ZERO error.
  *
  * Why exact is attainable where general quantile sketches (t-digest,
  * KLL) accept error: real metric domains are integral and bounded in
  * DISTINCT VALUES — latencies in ms, prices in cents, sizes in bytes
  * land on at most a few million distinct points no matter how many
  * billions of rows carry them. Memory is bounded by the distinct-value
  * count (16 B/entry), NOT the row count; the resolution knob is
  * pre-bucketing (`floor(value / unit)`) — the caller chooses the
  * domain, the sketch never approximates within it. A domain past
  * [[Vhist.MaxEntries]] fails FAST (the bitmap algebra's contract)
  * rather than silently degrading; unbounded/continuous domains belong
  * to `approx_percentile` or a coarser bucketing.
  *
  * Quantile rule (pinned so every engine replays it): `quantile(q)` =
  * the smallest value whose cumulative count ≥ ceil(q × N) — the
  * discrete lower quantile, the an28 exact-P99 rank rule. No
  * interpolation, no float arithmetic on ranks (`ceil` on an exact
  * integer product via BigDecimal), so Spark and the DuckDB oracle
  * agree bit-for-bit.
  *
  * Serialization is canonical (ascending values), a pure function of
  * the multiset — sketch bytes are stable under any partitioning or
  * merge order.
  */
object Vhist {
  /** Fail-fast distinct-value ceiling: 16M entries ≈ 256 MB buffer —
    * generous for any integral metric domain, loud for a mistake
    * (sketching raw nanosecond timestamps). */
  val MaxEntries: Int = 1 << 24

  private[functions] val Magic: Byte = 0x48 // 'H'
  private[functions] val Version: Byte = 1
  /** V2 adds a unit tag after the version byte: sketches built with
    * `vhist_sketch(value, unit)` carry their pre-bucket divisor IN the
    * bytes, so MERGE can refuse a unit mismatch instead of silently
    * count-adding ms buckets into seconds buckets. Unit-1 sketches
    * still serialize as V1 — bytes unchanged for every existing sketch
    * (canonical form stays a pure function of (multiset, unit)). */
  private[functions] val Version2: Byte = 2

  type Hist = java.util.TreeMap[java.lang.Long, java.lang.Long]

  def newHist(): Hist = new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  def add(h: Hist, v: Long, n: Long): Unit = {
    val prev = h.get(v)
    if (prev eq null) {
      require(h.size() < MaxEntries,
        s"vhist: more than $MaxEntries distinct values — pre-bucket the domain " +
          "(floor(value / unit)) or use approx_percentile")
      h.put(v, n)
    } else h.put(v, prev + n)
  }

  def merge(a: Hist, b: Hist): Hist = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(a, e.getKey, e.getValue) }
    a
  }

  def serialize(h: Hist): Array[Byte] = serializeTagged(h, 1L)

  /** Canonical bytes for (multiset, unit): unit 1 → the original V1
    * layout (every pre-existing sketch byte-stable), any other unit →
    * V2 with the unit tagged after the version byte. `unit = 0` is the
    * internal unset-partial sentinel (an empty merge buffer that has
    * not yet seen a sketch) and never appears in a FINAL sketch. */
  def serializeTagged(h: Hist, unit: Long): Array[Byte] = {
    val v2 = unit != 1L
    val buf = ByteBuffer.allocate(1 + 1 + (if (v2) 8 else 0) + 4 + 16 * h.size())
    buf.put(Magic)
    buf.put(if (v2) Version2 else Version)
    if (v2) buf.putLong(unit)
    buf.putInt(h.size())
    val it = h.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.getKey)
      buf.putLong(e.getValue)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Hist = {
    val (unit, h) = deserializeTagged(bytes)
    require(unit == 1L,
      s"vhist: sketch carries unit $unit — merge it with vhist_merge_quantile " +
        "(unit-aware) instead of reading it as a unit-1 histogram")
    h
  }

  /** Returns (unit, histogram). V1 bytes imply unit 1. */
  def deserializeTagged(bytes: Array[Byte]): (Long, Hist) = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.remaining() >= 6 && buf.get() == Magic,
      "vhist: not a graft value-histogram sketch (bad magic)")
    val v = buf.get()
    require(v == Version || v == Version2, s"vhist: unsupported sketch version $v")
    val unit = if (v == Version2) buf.getLong() else 1L
    require(unit >= 0L, s"vhist: bad sketch unit $unit")
    val n = buf.getInt()
    require(n >= 0 && n <= MaxEntries, s"vhist: bad sketch entry count $n")
    // unit 0 is the unset-PARTIAL sentinel and only ever serializes
    // EMPTY; hostile unit-0 bytes carrying entries would slip past
    // reconcileUnit's `incoming != 0` guard and count-add raw buckets
    // into any tier — the exact silent mixing the tag exists to stop
    require(unit >= 1L || n == 0,
      s"vhist: unit-0 sketch carrying $n entries is not a graft sketch")
    val h = newHist()
    var i = 0
    while (i < n) {
      val value = buf.getLong()
      val count = buf.getLong()
      // counts must be positive: a corrupt/hostile negative count would
      // make quantile()'s cumulative walk undershoot its target forever
      // and surface as an NPE instead of this loud format error
      require(count > 0L, s"vhist: non-positive count $count for value $value")
      h.put(value, count)
      i += 1
    }
    (unit, h)
  }

  /** Merge buffer carrying the unit the sketches agreed on: 0 = unset
    * (nothing merged yet). Unit reconciliation is FAIL-LOUD — adding
    * ms-bucket counts into seconds-bucket counts is silent corruption,
    * the exact disagreement the tagged format exists to prevent. */
  final class VBuf(var unit: Long, val h: Hist)

  private[functions] def reconcileUnit(buf: VBuf, incoming: Long, fn: String): Unit =
    if (incoming != 0L) {
      if (buf.unit == 0L) buf.unit = incoming
      else require(buf.unit == incoming,
        s"$fn: merging sketches with different units (${buf.unit} vs $incoming) " +
          "- re-sketch one side at the other's unit")
    }

  private[functions] def extractUnit(e: Expression, fn: String): Long = e match {
    case f if f.foldable => f.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case null => throw new IllegalArgumentException(
        s"$fn: unit must be a non-null integral literal")
      case other => throw new IllegalArgumentException(
        s"$fn: unit must be an integral literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: unit must be a foldable integral literal, got $other")
  }

  /** Smallest value whose cumulative count ≥ ceil(q × N); null for an
    * empty histogram. Rank arithmetic is exact (BigDecimal ceil). */
  def quantile(h: Hist, q: Double): Any = {
    var total = 0L
    val it0 = h.values().iterator()
    while (it0.hasNext) total += it0.next()
    if (total == 0L) null
    else {
      val target = java.math.BigDecimal.valueOf(q)
        .multiply(java.math.BigDecimal.valueOf(total))
        .setScale(0, java.math.RoundingMode.CEILING).longValueExact()
      val tgt = math.max(1L, target) // q = 0 → the minimum
      var cum = 0L
      val it = h.entrySet().iterator()
      var res: java.lang.Long = null
      while (it.hasNext && (res eq null)) {
        val e = it.next()
        cum += e.getValue
        if (cum >= tgt) res = e.getKey
      }
      res.longValue()
    }
  }

  private[functions] def extractQ(e: Expression, fn: String): Double = e match {
    // fold at analysis: SQL numeric literals parse as DECIMAL(1,1),
    // and foldable wrappers (CAST(0.99 AS DOUBLE)) are legal too
    case f if f.foldable => f.eval() match {
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case null => throw new IllegalArgumentException(
        s"$fn: quantile must be a non-null literal")
      case other => throw new IllegalArgumentException(
        s"$fn: quantile must be a DOUBLE/DECIMAL literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: quantile must be a foldable DOUBLE literal, got $other")
  }

  private[functions] def checkQ(fn: String, q: Double): TypeCheckResult =
    if (q >= 0.0 && q <= 1.0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn: quantile must be in [0, 1], got $q")

  // ---- Column API ----------------------------------------------------

  /** `df.groupBy(grain).agg(vhist_sketch($"latency_ms"))` — the
    * re-aggregable exact histogram (binary). */
  def vhist_sketch(c: Column): Column =
    ColumnBridge.column(
      VhistSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `vhist_sketch($"latency_us", 1000)` — pre-bucket floor(value/unit)
    * PINNED inside the expression and TAGGED in the sketch bytes, so
    * INIT and MERGE can never disagree on units: merging sketches with
    * different units fails loudly, and the merged quantile comes back
    * in ORIGINAL units (the bucket's lower edge, bucket × unit). */
  def vhist_sketch(c: Column, unit: Long): Column =
    ColumnBridge.column(
      VhistSketchUnitExpr(ColumnBridge.expression(c),
        Literal(unit, LongType)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(vhist_merge_quantile($"sk", 0.99))`
    * — the exact q-quantile from merged sketches. */
  def vhist_merge_quantile(c: Column, q: Double): Column =
    ColumnBridge.column(
      VhistMergeQuantileExpr(ColumnBridge.expression(c),
        Literal(q, DoubleType)).toAggregateExpression())

  /** `df.agg(vhist_quantile($"latency_ms", 0.5))` — one-shot exact
    * quantile over raw values. */
  def vhist_quantile(c: Column, q: Double): Column =
    ColumnBridge.column(
      VhistQuantileExpr(ColumnBridge.expression(c),
        Literal(q, DoubleType)).toAggregateExpression())

  /** `daily.groupBy(month).agg(vhist_merge_sketch($"sk"))` — roll fine
    * histograms into a STORED coarser sketch table (count addition;
    * bytes identical to sketching the values directly; unit-checked). */
  def vhist_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      VhistMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())
}

/** INIT: raw integral values → serialized exact histogram. */
case class VhistSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vhist.Hist]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "vhist_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkIntegral(prettyName, child.dataType)

  override def createAggregationBuffer(): Vhist.Hist = Vhist.newHist()

  override def update(buffer: Vhist.Hist, input: InternalRow): Vhist.Hist = {
    val v = child.eval(input)
    if (v != null) Vhist.add(buffer, BitmapKey.toLong(v), 1L)
    buffer
  }

  override def merge(b: Vhist.Hist, other: Vhist.Hist): Vhist.Hist =
    Vhist.merge(b, other)

  override def eval(b: Vhist.Hist): Any = Vhist.serialize(b)

  override def serialize(b: Vhist.Hist): Array[Byte] = Vhist.serialize(b)
  override def deserialize(bytes: Array[Byte]): Vhist.Hist =
    Vhist.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VhistSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VhistSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VhistSketchExpr =
    copy(child = newChild)
}

/** INIT with a PINNED pre-bucket unit: raw values → floor(value/unit)
  * buckets → serialized histogram TAGGED with the unit (V2 bytes), so
  * a downstream merge can verify every sketch bucketed the same way.
  * `unit = 1` degrades to [[VhistSketchExpr]] exactly, bytes included. */
case class VhistSketchUnitExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vhist.Hist]
  with BinaryLike[Expression] {

  private lazy val unit: Long = Vhist.extractUnit(right, prettyName)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "vhist_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkIntegral(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!right.foldable || !(right.dataType == LongType ||
        right.dataType == org.apache.spark.sql.types.IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral unit, got ${right.dataType.simpleString}")
    else try {
      if (unit >= 1L) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unit must be >= 1, got $unit")
    } catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override def createAggregationBuffer(): Vhist.Hist = Vhist.newHist()

  override def update(buffer: Vhist.Hist, input: InternalRow): Vhist.Hist = {
    val v = left.eval(input)
    // floorDiv: the pre-bucket rule, identical for negative values to
    // SQL floor(value / unit) — pinned HERE so no call site can drift
    if (v != null) Vhist.add(buffer, Math.floorDiv(BitmapKey.toLong(v), unit), 1L)
    buffer
  }

  override def merge(b: Vhist.Hist, other: Vhist.Hist): Vhist.Hist =
    Vhist.merge(b, other)

  override def eval(b: Vhist.Hist): Any = Vhist.serializeTagged(b, unit)

  // partials stay inside ONE expression instance (one unit): tag them
  // anyway so a serialized partial is indistinguishable from a final
  override def serialize(b: Vhist.Hist): Array[Byte] = Vhist.serializeTagged(b, unit)
  override def deserialize(bytes: Array[Byte]): Vhist.Hist =
    Vhist.deserializeTagged(bytes)._2

  override def withNewMutableAggBufferOffset(newOffset: Int): VhistSketchUnitExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VhistSketchUnitExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VhistSketchUnitExpr =
    copy(left = newLeft, right = newRight)
}

/** MERGE: add sketch counts, eval the exact q-quantile. Null sketches
  * (outer joins) ignored; empty merged histogram → null. UNIT-AWARE:
  * sketches carrying different pre-bucket units fail loudly (count-
  * adding ms buckets into seconds buckets is silent corruption), and
  * the quantile returns in ORIGINAL units — the winning bucket's lower
  * edge, bucket × unit (unit-1 sketches: unchanged semantics). */
case class VhistMergeQuantileExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vhist.VBuf]
  with BinaryLike[Expression] {

  private lazy val q: Double = Vhist.extractQ(right, prettyName)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vhist_merge_quantile"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkBinary(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!right.foldable || !(right.dataType == DoubleType ||
        right.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable DOUBLE/DECIMAL quantile, got ${right.dataType.simpleString}")
    else try Vhist.checkQ(prettyName, q)
    catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override def createAggregationBuffer(): Vhist.VBuf =
    new Vhist.VBuf(0L, Vhist.newHist())

  override def update(buffer: Vhist.VBuf, input: InternalRow): Vhist.VBuf = {
    left.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val (u, h) = Vhist.deserializeTagged(bytes)
        Vhist.reconcileUnit(buffer, u, prettyName)
        Vhist.merge(buffer.h, h)
        buffer
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Vhist.VBuf, other: Vhist.VBuf): Vhist.VBuf = {
    Vhist.reconcileUnit(b, other.unit, prettyName)
    Vhist.merge(b.h, other.h)
    b
  }

  override def eval(b: Vhist.VBuf): Any = Vhist.quantile(b.h, q) match {
    case null => null
    case bucket: Long => bucket * math.max(1L, b.unit)
  }

  override def serialize(b: Vhist.VBuf): Array[Byte] =
    Vhist.serializeTagged(b.h, b.unit)
  override def deserialize(bytes: Array[Byte]): Vhist.VBuf = {
    val (u, h) = Vhist.deserializeTagged(bytes)
    new Vhist.VBuf(u, h)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VhistMergeQuantileExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VhistMergeQuantileExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VhistMergeQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** Sketch → SKETCH re-aggregation (the bitmap/hll merge_sketch twin):
  * count-ADD fine histograms into a STORED coarser histogram — daily
  * value sketches roll into monthly ones, byte-identical to sketching
  * the values directly (count addition is associative/commutative),
  * with the same unit reconciliation as the quantile merge: mixing
  * units fails loudly and the merged sketch carries the agreed unit. */
case class VhistMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vhist.VBuf]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "vhist_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Vhist.VBuf =
    new Vhist.VBuf(0L, Vhist.newHist())

  override def update(buffer: Vhist.VBuf, input: InternalRow): Vhist.VBuf = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val (u, h) = Vhist.deserializeTagged(bytes)
        Vhist.reconcileUnit(buffer, u, prettyName)
        Vhist.merge(buffer.h, h)
        buffer
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Vhist.VBuf, other: Vhist.VBuf): Vhist.VBuf = {
    Vhist.reconcileUnit(b, other.unit, prettyName)
    Vhist.merge(b.h, other.h)
    b
  }

  // an empty merge (no sketches seen) emits the canonical empty unit-1
  // sketch, which merges as an identity anywhere downstream
  override def eval(b: Vhist.VBuf): Any =
    Vhist.serializeTagged(b.h, math.max(1L, b.unit))

  override def serialize(b: Vhist.VBuf): Array[Byte] =
    Vhist.serializeTagged(b.h, b.unit)
  override def deserialize(bytes: Array[Byte]): Vhist.VBuf = {
    val (u, h) = Vhist.deserializeTagged(bytes)
    new Vhist.VBuf(u, h)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VhistMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VhistMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VhistMergeSketchExpr =
    copy(child = newChild)
}

/** One-shot: raw values → exact q-quantile (INIT + quantile fused). */
case class VhistQuantileExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vhist.Hist]
  with BinaryLike[Expression] {

  private lazy val q: Double = Vhist.extractQ(right, prettyName)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vhist_quantile"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkIntegral(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!right.foldable || !(right.dataType == DoubleType ||
        right.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable DOUBLE/DECIMAL quantile, got ${right.dataType.simpleString}")
    else try Vhist.checkQ(prettyName, q)
    catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override def createAggregationBuffer(): Vhist.Hist = Vhist.newHist()

  override def update(buffer: Vhist.Hist, input: InternalRow): Vhist.Hist = {
    val v = left.eval(input)
    if (v != null) Vhist.add(buffer, BitmapKey.toLong(v), 1L)
    buffer
  }

  override def merge(b: Vhist.Hist, other: Vhist.Hist): Vhist.Hist =
    Vhist.merge(b, other)

  override def eval(b: Vhist.Hist): Any = Vhist.quantile(b, q)

  override def serialize(b: Vhist.Hist): Array[Byte] = Vhist.serialize(b)
  override def deserialize(bytes: Array[Byte]): Vhist.Hist =
    Vhist.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VhistQuantileExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VhistQuantileExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VhistQuantileExpr =
    copy(left = newLeft, right = newRight)
}
