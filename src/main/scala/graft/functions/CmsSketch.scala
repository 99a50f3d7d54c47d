package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min frequency sketches as sketch-TABLE citizens — the
  * FREQUENCY leg of the sketch algebra, completing the family next to
  * exact distinct (bitmap), approximate distinct (HLL), exact
  * quantiles (vhist), and the uniform sample (KMV): a d × w counter
  * matrix whose merge is cell-wise ADDITION (associative, commutative
  * — order-independent), so a warehouse materializes one sketch per
  * fine grain and answers "how often does key X appear" at ANY coarser
  * grain from the sketch table — with the classic CMS one-sided
  * guarantee (estimate ≥ true count, Cormode & Muthukrishnan 2005).
  *
  * This is the INIT → MERGE → STORED-tier form of the engine's
  * existing CMS relation ([[graft.operators.Sketches]], an14): SAME
  * d = 4, w = 2048, and SAME probe hash
  * `('0x' || substr(md5('cms:' || j || ':' || key), 1, 8))::BIGINT % w`
  * — so estimates off the sketch BYTES are value-identical to the
  * relation form and fully SQL-replayable: the oracle rebuilds the
  * cells and takes the same min, no bound-check hedging needed.
  *
  * Serialization is canonical (a pure function of the cell vector):
  * the smaller of a dense 8 B/cell page (64 KiB) and a sparse sorted
  * (cell-index, count) list — fine grains mass-produce near-empty
  * groups that pay ~12 B per OCCUPIED cell instead of the page.
  * In-memory state stays the dense array (update/merge hot paths flat).
  *
  * Keys are STRINGS by contract (cast first): the probe hash must see
  * the exact bytes the oracle hashes.
  */
object Cms {
  /** Depth (probe rows) and width — fixed engine constants, shared
    * with the an14 relation form; 4 × 2048 longs = 64 KiB in-memory
    * state per group, ε ≈ e/w ≈ 0.13% of the row count, δ ≈ e^-4. */
  val D: Int = 4
  val W: Int = 2048
  val Cells: Int = D * W

  private[functions] val Magic: Byte = 0x43 // 'C'
  private[functions] val Version: Byte = 1
  private[functions] val DenseTag: Byte = 0
  private[functions] val SparseTag: Byte = 1
  /** Sparse wins below this occupancy: 12 B/entry vs 8 B/cell · 8192. */
  private[functions] val SparseMax: Int = (Cells.toLong * 8 / 12).toInt // 5461

  private val mdTL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  // the d=4 probe prefixes, precomputed: position() runs d times per
  // input ROW (the per-word hot path of an44), and interpolating
  // "cms:$j:" there would allocate a String + byte[] per call for one
  // of four constants — the same per-value-allocation trap Md5Prefix
  // exists to avoid
  private val prefixBytes: Array[Array[Byte]] =
    Array.tabulate(D)(j => s"cms:$j:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Probe position of `key` in row j: first 8 md5 hex digits of
    * "cms:j:key" as a long, mod w — byte-identical to
    * [[graft.operators.Sketches.cmsPosition]] and the oracle SQL. */
  def position(j: Int, key: UTF8String): Int = {
    val md = mdTL.get()
    md.reset()
    md.update(prefixBytes(j))
    val digest = md.digest(key.getBytes)
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v % W).toInt
  }

  def newCells(): Array[Long] = new Array[Long](Cells)

  def update(cells: Array[Long], key: UTF8String): Unit = updateWeighted(cells, key, 1L)

  /** Weighted add — lets a sketch build from an already-AGGREGATED
    * (key, count) relation without re-expanding rows (the an14
    * relation form's input shape). Negative weights are refused: a
    * negative cell would silently break the min-estimate's one-sided
    * (≥ true) guarantee. */
  def updateWeighted(cells: Array[Long], key: UTF8String, weight: Long): Unit = {
    require(weight >= 0L,
      s"cms: negative weight $weight for key '$key' — cells must stay non-negative " +
        "or the min-estimate's lower-bound guarantee silently breaks")
    if (weight != 0L) {
      var j = 0
      while (j < D) { cells(j * W + position(j, key)) += weight; j += 1 }
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == Cells && b.length == Cells,
      s"cms merge: cell width mismatch (${a.length}, ${b.length}) — not a graft CMS sketch")
    var i = 0
    while (i < Cells) { a(i) += b(i); i += 1 }
    a
  }

  /** min over the key's d cells — ≥ the true count, always. */
  def estimate(cells: Array[Long], key: UTF8String): Long = {
    var est = Long.MaxValue
    var j = 0
    while (j < D) {
      val c = cells(j * W + position(j, key))
      if (c < est) est = c
      j += 1
    }
    est
  }

  /** Canonical bytes for the cell vector: the smaller encoding wins
    * (sparse iff occupied < [[SparseMax]] — a deterministic rule on
    * the vector, so any merge order/partitioning yields identical
    * bytes). */
  def serialize(cells: Array[Long]): Array[Byte] = {
    require(cells.length == Cells, s"cms serialize: bad cell width ${cells.length}")
    var occupied = 0
    var i = 0
    while (i < Cells) { if (cells(i) != 0L) occupied += 1; i += 1 }
    if (occupied >= SparseMax) {
      val buf = ByteBuffer.allocate(3 + 8 * Cells)
      buf.put(Magic); buf.put(Version); buf.put(DenseTag)
      i = 0
      while (i < Cells) { buf.putLong(cells(i)); i += 1 }
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(3 + 4 + 12 * occupied)
      buf.put(Magic); buf.put(Version); buf.put(SparseTag)
      buf.putInt(occupied)
      i = 0
      while (i < Cells) { // ascending index = canonical entry order
        if (cells(i) != 0L) { buf.putInt(i); buf.putLong(cells(i)) }
        i += 1
      }
      buf.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.remaining() >= 3 && buf.get() == Magic,
      "cms: not a graft CMS sketch (bad magic)")
    val v = buf.get()
    require(v == Version, s"cms: unsupported sketch version $v")
    val cells = newCells()
    buf.get() match {
      case DenseTag =>
        require(buf.remaining() == 8 * Cells,
          s"cms: bad dense sketch size (${bytes.length} bytes)")
        var i = 0
        while (i < Cells) { cells(i) = buf.getLong(); i += 1 }
      case SparseTag =>
        val n = buf.getInt()
        require(n >= 0 && n < SparseMax && buf.remaining() == 12 * n,
          s"cms: bad sparse sketch entry count $n for ${bytes.length} bytes")
        var prev = -1
        var i = 0
        while (i < n) {
          val idx = buf.getInt()
          val count = buf.getLong()
          require(idx > prev && idx < Cells, s"cms: sparse entries out of order at $idx")
          // zero entries are non-canonical; negative counts would make
          // the min-estimate silently undershoot instead of erroring
          require(count > 0L, s"cms: non-positive count $count at cell $idx")
          cells(idx) = count
          prev = idx
          i += 1
        }
      case other => throw new IllegalArgumentException(
        s"cms: unknown sketch layout tag $other")
    }
    cells
  }

  /** Shared by eval and generated code. */
  def estFromBytes(bytes: Array[Byte], key: UTF8String): Long =
    estimate(deserialize(bytes), key)

  /** Multi-key probe: ONE deserialize, k probes — the fact-sized read
    * pattern's fix (r11 verdict #4): `cms_est` pays an O(sketch) decode
    * per probed ROW (a dense page is 8,192 longs), so probing k keys
    * against one sketch row cost k decodes; here it costs one. Null
    * key elements yield null estimates (outer-join friendly). Shared
    * by eval and generated code. */
  def estAllFromBytes(bytes: Array[Byte],
      keys: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cells = deserialize(bytes)
    val n = keys.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (keys.isNullAt(i)) null
        else estimate(cells, keys.getUTF8String(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private[functions] def checkKey(fn: String, dt: DataType): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires a STRING key column (cast first — the probe hash must " +
        s"see the exact bytes the oracle hashes), got ${dt.simpleString}")

  // ---- Column API ----------------------------------------------------

  /** `df.groupBy(grain).agg(cms_sketch($"word"))` — re-aggregable
    * count-min frequency sketch (binary; d=4, w=2048). */
  def cms_sketch(c: Column): Column =
    ColumnBridge.column(
      CmsSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `wc.groupBy(grain).agg(cms_sketch($"word", $"n"))` — weighted
    * INIT: build the sketch from an already-aggregated (key, count)
    * relation; byte-identical to sketching the raw rows (cell
    * addition), so pre-counted pipelines skip the re-expansion. */
  def cms_sketch(c: Column, weight: Column): Column =
    ColumnBridge.column(
      CmsSketchWeightedExpr(ColumnBridge.expression(c),
        ColumnBridge.expression(weight)).toAggregateExpression())

  /** `daily.groupBy(month).agg(cms_merge_sketch($"sk"))` — cell-add
    * fine sketches into a STORED coarser sketch (bytes identical to
    * sketching the facts directly). */
  def cms_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      CmsMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `cms_est($"sk", $"word")` — the frequency estimate (≥ true count)
    * for a key, per row: join the sketch table with candidate keys. */
  def cms_est(sk: Column, key: Column): Column =
    ColumnBridge.column(
      CmsEstExpr(ColumnBridge.expression(sk), ColumnBridge.expression(key)))

  /** `cms_est_all($"sk", $"words")` — estimates for a whole
    * array<string> of keys in ONE sketch decode (the fact-sized probe
    * pattern: k probes per row cost one O(sketch) deserialize, not k). */
  def cms_est_all(sk: Column, keys: Column): Column =
    ColumnBridge.column(
      CmsEstAllExpr(ColumnBridge.expression(sk), ColumnBridge.expression(keys)))
}

/** INIT: raw string keys → serialized count-min sketch. */
case class CmsSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    Cms.checkKey(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Long] = Cms.newCells()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.update(buffer, v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] =
    Cms.merge(b, other)

  override def eval(b: Array[Long]): Any = Cms.serialize(b)

  override def serialize(b: Array[Long]): Array[Byte] = Cms.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchExpr =
    copy(child = newChild)
}

/** Weighted INIT: (key, count) rows → serialized sketch, cell-adding
  * `weight` per probe row — byte-identical to [[CmsSketchExpr]] over
  * the expanded multiset. Null key or null weight skips the row;
  * negative weights fail loudly (the lower-bound guarantee). */
case class CmsSketchWeightedExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = Cms.checkKey(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else BitmapKey.checkIntegral(s"$prettyName (weight)", right.dataType)
  }

  override def createAggregationBuffer(): Array[Long] = Cms.newCells()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = left.eval(input)
    val w = right.eval(input)
    if (k != null && w != null)
      Cms.updateWeighted(buffer, k.asInstanceOf[UTF8String], BitmapKey.toLong(w))
    buffer
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] =
    Cms.merge(b, other)

  override def eval(b: Array[Long]): Any = Cms.serialize(b)

  override def serialize(b: Array[Long]): Array[Byte] = Cms.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchWeightedExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchWeightedExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsSketchWeightedExpr =
    copy(left = newLeft, right = newRight)
}

/** Sketch → SKETCH re-aggregation: cell-wise addition of fine sketches
  * into a STORED coarser sketch — byte-identical to sketching the
  * facts directly, so tiered frequency roll-ups never rescan and the
  * one-sided (≥ true) guarantee survives every tier. */
case class CmsMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Long] = Cms.newCells()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => Cms.merge(buffer, Cms.deserialize(bytes))
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] =
    Cms.merge(b, other)

  override def eval(b: Array[Long]): Any = Cms.serialize(b)

  override def serialize(b: Array[Long]): Array[Byte] = Cms.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeSketchExpr =
    copy(child = newChild)
}

/** Scalar: (sketch bytes, key) → the count-min estimate, per row.
  * Real codegen via the shared static helper. Null if either side is
  * null (outer-join friendly). */
case class CmsEstExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_est requires (BINARY sketch, STRING key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_est"

  override protected def nullSafeEval(sk: Any, key: Any): Any =
    Cms.estFromBytes(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, key) =>
      s"${ev.value} = graft.functions.Cms.estFromBytes($sk, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar: (sketch bytes, array<string> keys) → array of count-min
  * estimates with ONE decode — [[CmsEstExpr]]'s multi-key form for the
  * fact-sized probe pattern. Null if either input is null; null key
  * ELEMENTS yield null estimates. Real codegen via the shared static
  * helper. */
case class CmsEstAllExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _)
        if left.dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cms_est_all requires (BINARY sketch, ARRAY<STRING> keys), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def prettyName: String = "cms_est_all"

  override protected def nullSafeEval(sk: Any, keys: Any): Any =
    Cms.estAllFromBytes(sk.asInstanceOf[Array[Byte]],
      keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, keys) =>
      s"${ev.value} = graft.functions.Cms.estAllFromBytes($sk, $keys);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstAllExpr =
    copy(left = newLeft, right = newRight)
}
