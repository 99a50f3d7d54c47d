package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketches with the SAME INIT → MERGE
  * surface as the exact bitmap algebra ([[BitmapSketchExpr]] /
  * [[BitmapMergeCountExpr]]) — the approximate twin for key domains
  * the exact bitmap cannot bound: open string universes (URLs, user
  * agents), unbounded id spaces, anything where ~1.6% error buys a
  * FIXED 4 KiB in-memory state per group regardless of cardinality
  * (serialized sketches go SPARSE below m/8 occupancy — see
  * [[Hll.serialize]] — so a fine grain's near-empty groups don't pay
  * the full page in the sketch table).
  *
  * Flajolet–Fuss–Gandouet–Meunier (AofA 2007) with the standard
  * small-range linear-counting correction. 2^p byte registers
  * (p = 12 → 4096 B, relative error ≈ 1.04/√m ≈ 1.6%); merge is a
  * register-wise MAX — associative, commutative, idempotent, so
  * partial merges are order-independent and the sketch bytes are a
  * pure function of the key SET, exactly like the bitmap's contract.
  * The register index/rank derive from a splitmix64/FNV-style 64-bit
  * hash computed HERE (not Spark's internal hash functions), so the
  * estimate is a stable engine contract, not an implementation detail
  * that shifts under a Spark upgrade.
  *
  * Estimates cannot be oracle-equal to COUNT(DISTINCT); gate queries
  * therefore output the exact count alongside an `est_ok` bound check
  * (the n8/n9 recall-gate pattern) — the oracle pins exactness of the
  * exact column and `TRUE` for the bound.
  *
  * When to use which (the decision is part of the engine surface):
  * bitmap when keys are integral and you need exactness or exact
  * intersections (AND); HLL when the domain is unbounded/stringly and
  * a percent-level union estimate is enough. Intersections via HLL
  * inclusion-exclusion compound error — the bitmap is the engine's
  * answer to overlap questions, deliberately not replicated here.
  */
object Hll {
  val P: Int = 12
  val M: Int = 1 << P // 4096 registers

  // alpha_m for m >= 128 (Flajolet et al. §4)
  private val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** 64-bit avalanche hash: splitmix64 finalizer over a seed mixed
    * from the value. Strings fold UTF-8 bytes FNV-1a style before the
    * finalizer; integral types hash their Long form, so 1 : BYTE and
    * 1L : BIGINT sketch identically (matching COUNT(DISTINCT) under
    * the engine's integral widening). */
  def hash(v: Any): Long = v match {
    case x: Long => mix(x)
    case x: Int => mix(x.toLong)
    case x: Short => mix(x.toLong)
    case x: Byte => mix(x.toLong)
    case s: UTF8String =>
      val b = s.getBytes
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var i = 0
      while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      mix(h)
    case s: String =>
      hash(UTF8String.fromString(s))
    case b: Array[Byte] =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      mix(h)
    case other => throw new IllegalArgumentException(
      s"hll hash: unsupported ${other.getClass.getSimpleName}")
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def update(regs: Array[Byte], v: Any): Unit = {
    val h = hash(v)
    val idx = (h >>> (64 - P)).toInt // top p bits pick the register
    // rank = leading zeros of the remaining 64-p bits, +1; cap fits a byte
    val rest = h << P
    val rank = (if (rest == 0L) (64 - P) else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (regs(idx) < rank) regs(idx) = rank.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M,
      s"hll merge: register width mismatch (${a.length}, ${b.length}) — not a graft HLL sketch")
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  // ---- serialized form: sparse below m/8 occupancy ---------------------
  // A fine grain (an38's day × type) holds thousands of near-empty
  // groups; a fixed 4 KiB register page per group is mostly zeros. The
  // CANONICAL serialized form is therefore chosen by a deterministic
  // rule on the register SET (the Bitmap64 contract): fewer than M/8
  // occupied registers → a sorted (idx, rank) list (3 B/entry + 6 B
  // header, ≤ 1539 B, ~10× smaller near-empty); otherwise the raw M
  // register bytes (the pre-r11 layout, byte-identical — dense sketches
  // and old persisted columns are unchanged). In-memory stays a dense
  // array — update/merge hot paths pay nothing.

  /** Promotion boundary: occupied-register count below this serializes
    * sparse. M/8 = 512: sparse max size 6 + 3·511 = 1539 B < M. */
  val SparseMax: Int = M / 8
  private[functions] val SparseMagic: Byte = 0x68 // 'h'
  private[functions] val SparseVersion: Byte = 1

  /** Canonical bytes for the register set (dense arrays ≥ M/8 occupancy
    * keep the legacy raw-register layout, so the form is unambiguous:
    * length == M ⇔ dense). */
  def serialize(regs: Array[Byte]): Array[Byte] = {
    require(regs.length == M, s"hll serialize: bad register width ${regs.length}")
    var occupied = 0
    var i = 0
    while (i < M) { if (regs(i) != 0) occupied += 1; i += 1 }
    if (occupied >= SparseMax) regs.clone()
    else {
      val buf = java.nio.ByteBuffer.allocate(6 + 3 * occupied)
      buf.put(SparseMagic)
      buf.put(SparseVersion)
      buf.putInt(occupied)
      i = 0
      while (i < M) { // ascending idx = canonical entry order
        if (regs(i) != 0) { buf.putChar(i.toChar); buf.put(regs(i)) }
        i += 1
      }
      buf.array()
    }
  }

  /** Either form → a dense register array (always a fresh copy). */
  def toDense(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length == M) bytes.clone()
    else {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.remaining() >= 6 && buf.get() == SparseMagic,
        s"hll: not a graft HLL sketch (${bytes.length} bytes, bad magic)")
      val v = buf.get()
      require(v == SparseVersion, s"hll: unsupported sparse sketch version $v")
      val n = buf.getInt()
      require(n >= 0 && n < SparseMax && buf.remaining() == 3 * n,
        s"hll: bad sparse sketch entry count $n for ${bytes.length} bytes")
      val regs = new Array[Byte](M)
      var prev = -1
      var i = 0
      while (i < n) {
        val idx = buf.getChar().toInt
        val rank = buf.get()
        require(idx > prev && idx < M, s"hll: sparse entries out of order at idx $idx")
        require(rank >= 1 && rank <= 64 - P + 1, s"hll: bad register rank $rank")
        regs(idx) = rank
        prev = idx
        i += 1
      }
      regs
    }

  def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / invSum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.rint(e).toLong
  }

  private[functions] def checkKey(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires an integral, STRING, or BINARY key column, got ${other.simpleString}")
  }

  // ---- Column API ----------------------------------------------------

  /** `df.groupBy(grain).agg(hll_sketch($"url"))` — 4 KiB re-aggregable
    * sketch. */
  def hll_sketch(c: Column): Column =
    ColumnBridge.column(
      HllSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(hll_merge_count($"sk"))` —
    * estimated distinct count from merged sketches. */
  def hll_merge_count(c: Column): Column =
    ColumnBridge.column(
      HllMergeCountExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `df.agg(hll_distinct($"url"))` — one-shot estimate. */
  def hll_distinct(c: Column): Column =
    ColumnBridge.column(
      HllDistinctExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `daily.groupBy(month).agg(hll_merge_sketch($"sk"))` — roll fine
    * sketches into a STORED coarser sketch table (max-merge; bytes
    * identical to sketching the keys directly). */
  def hll_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      HllMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())
}

/** INIT: build the register array from raw keys; eval returns the
  * serialized sketch (BinaryType) — the registers ARE the canonical
  * bytes (max-merge order-independence). */
case class HllSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkKey(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v)
    buffer
  }

  override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(b, other)

  override def eval(b: Array[Byte]): Any = Hll.serialize(b)

  override def serialize(b: Array[Byte]): Array[Byte] = Hll.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = Hll.toDense(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchExpr =
    copy(child = newChild)
}

/** MERGE: max-combine serialized sketches, eval the estimate. */
case class HllMergeCountExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge_count"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => Hll.merge(buffer, Hll.toDense(bytes))
      case other => throw new IllegalArgumentException(
        s"hll_merge_count requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(b, other)

  override def eval(b: Array[Byte]): Any = Hll.estimate(b)

  override def serialize(b: Array[Byte]): Array[Byte] = Hll.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = Hll.toDense(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeCountExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeCountExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeCountExpr =
    copy(child = newChild)
}

/** Sketch → SKETCH re-aggregation (the bitmap_merge_sketch twin):
  * max-merge fine sketches into a STORED coarser sketch — daily HLLs
  * roll into monthly HLLs, byte-identical to sketching the keys
  * directly (register-wise max is associative/idempotent), so a tiered
  * roll-up hierarchy never rescans facts and never compounds error. */
case class HllMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => Hll.merge(buffer, Hll.toDense(bytes))
      case other => throw new IllegalArgumentException(
        s"hll_merge_sketch requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(b, other)

  override def eval(b: Array[Byte]): Any = Hll.serialize(b)

  override def serialize(b: Array[Byte]): Array[Byte] = Hll.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = Hll.toDense(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeSketchExpr =
    copy(child = newChild)
}

/** One-shot estimate over raw keys (INIT + estimate fused). */
case class HllDistinctExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkKey(prettyName, child.dataType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v)
    buffer
  }

  override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(b, other)

  override def eval(b: Array[Byte]): Any = Hll.estimate(b)

  override def serialize(b: Array[Byte]): Array[Byte] = Hll.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = Hll.toDense(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinctExpr =
    copy(child = newChild)
}
