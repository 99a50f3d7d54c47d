package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) bottom-k sketch — the SAMPLE leg of the
  * sketch algebra, next to exact distinct (bitmap), approximate
  * distinct (HLL), and exact quantiles (vhist): a fixed-size,
  * mergeable, DETERMINISTIC uniform sample of the distinct keys of a
  * group, with the classic KMV distinct estimate for free
  * (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007).
  *
  * What it buys at 100 TB: "show me 50 example documents per
  * (source, language) cell" and "how many distinct keys, roughly"
  * answered from a sketch table — the corpus is scanned ONCE to build
  * per-fine-grain sketches, and every coarser sample/estimate is a
  * sketch MERGE; no per-group sort, no LIMIT-per-group window over
  * the facts, no second scan when the grouping changes. Because the
  * sample is the k smallest (hash, key) pairs under a FIXED hash,
  * it is a uniform sample of the distinct keys that is also a pure
  * function of the key SET: any partitioning, arrival order, or
  * roll-up tree yields byte-identical sketches (bottom-k of a union
  * of bottom-k's = bottom-k of the union), so stored sketch tiers
  * compose exactly like the bitmap's.
  *
  * The hash is the engine's md5 prefix ([[Md5Prefix.prefix]], 15 hex
  * digits = 60 bits) — value-identical to ANSI
  * `('0x' || substr(md5(key), 1, 15))::BIGINT`, so the DuckDB oracle
  * replays BOTH the sample membership and the estimate bit-for-bit
  * (unlike HLL, whose register estimate can only be bound-checked).
  * Keys are STRINGS by contract (cast first); the hash must see the
  * exact bytes the oracle hashes.
  *
  * Estimate rule (pinned): with n = kept entries and H = 2^60,
  * n < k → n EXACTLY (the sketch holds every distinct key);
  * n = k → (k-1) · H / h_k with exact integer arithmetic
  * (BigInteger), h_k = the k-th smallest hash. Ties between distinct
  * keys on the same 60-bit hash are kept as separate entries ordered
  * by key bytes (unsigned lexicographic = DuckDB's binary VARCHAR
  * order), so even the astronomically-unlikely collision case is
  * deterministic on both engines.
  */
object Kmv {
  /** Hash width in hex digits: 60 bits, the widest an oracle-side
    * `('0x' || substr(md5(x), 1, N))::BIGINT` can carry losslessly. */
  val HexDigits: Int = 15
  /** Size of the hash space, 2^60 — the estimate's numerator scale. */
  val HashSpace: Long = 1L << 60
  /** Sanity cap on k: 64k entries ≈ MBs per sketch — a sample, not a
    * table. Bigger "samples" belong to a plain groupBy. */
  val MaxK: Int = 1 << 16

  private[functions] val Magic: Byte = 0x4b // 'K'
  private[functions] val Version: Byte = 1

  /** One kept (hash, key) pair. Ordering: hash ascending, then key
    * bytes unsigned-lexicographic — DuckDB's `ORDER BY h, k` under
    * binary VARCHAR collation, pinned here so the oracle's
    * row_number() walk visits entries in exactly this order. */
  final class Entry(val hash: Long, val key: Array[Byte]) extends Comparable[Entry] {
    override def compareTo(o: Entry): Int = {
      if (hash != o.hash) { if (hash < o.hash) -1 else 1 }
      else {
        val n = math.min(key.length, o.key.length)
        var i = 0
        while (i < n) {
          val a = key(i) & 0xff
          val b = o.key(i) & 0xff
          if (a != b) return if (a < b) -1 else 1
          i += 1
        }
        Integer.compare(key.length, o.key.length)
      }
    }
  }

  /** Bounded bottom-k state. `k == 0` is the internal unset-partial
    * sentinel (a merge buffer that has not yet seen a sketch) and
    * never appears in a FINAL sketch. */
  final class State(var k: Int) {
    val set = new java.util.TreeSet[Entry]()

    def addKey(key: UTF8String): Unit =
      addEntry(new Entry(Md5Prefix.prefix(key, HexDigits), key.getBytes))

    def addEntry(e: Entry): Unit = {
      if (set.size() < k) { set.add(e); () }
      else if (e.compareTo(set.last()) < 0) {
        if (set.add(e)) { set.pollLast(); () }
      }
    }

    def mergeFrom(other: State, fn: String): Unit = {
      reconcileK(this, other.k, fn)
      val it = other.set.iterator()
      while (it.hasNext) addEntry(it.next())
    }
  }

  private[functions] def reconcileK(buf: State, incoming: Int, fn: String): Unit =
    if (incoming != 0) {
      if (buf.k == 0) buf.k = incoming
      else require(buf.k == incoming,
        s"$fn: merging kmv sketches with different k (${buf.k} vs $incoming) " +
          "- a bottom-j of a bottom-k (j < k) loses the estimate contract; " +
          "re-sketch one side at the other's k")
    }

  /** Canonical bytes: a pure function of (key set, k) — entries in
    * ascending (hash, key) order, which the bounded insert discipline
    * already maintains. */
  def serialize(s: State): Array[Byte] = {
    var bytes = 0
    val it0 = s.set.iterator()
    while (it0.hasNext) bytes += 12 + it0.next().key.length
    val buf = ByteBuffer.allocate(2 + 4 + 4 + bytes)
    buf.put(Magic)
    buf.put(Version)
    buf.putInt(s.k)
    buf.putInt(s.set.size())
    val it = s.set.iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.hash)
      buf.putInt(e.key.length)
      buf.put(e.key)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.remaining() >= 10 && buf.get() == Magic,
      "kmv: not a graft KMV sketch (bad magic)")
    val v = buf.get()
    require(v == Version, s"kmv: unsupported sketch version $v")
    val k = buf.getInt()
    require(k >= 0 && k <= MaxK, s"kmv: bad sketch k $k")
    val n = buf.getInt()
    require(n >= 0 && n <= k, s"kmv: bad sketch entry count $n for k $k")
    val s = new State(k)
    var prev: Entry = null
    var i = 0
    while (i < n) {
      require(buf.remaining() >= 12, "kmv: truncated sketch entry")
      val h = buf.getLong()
      require(h >= 0L && h < HashSpace, s"kmv: hash $h outside the 60-bit space")
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining(), s"kmv: bad key length $len")
      val key = new Array[Byte](len)
      buf.get(key)
      val e = new Entry(h, key)
      // strict ascending order = canonical form; equality would mean a
      // duplicated entry, also corrupt
      require(prev == null || prev.compareTo(e) < 0,
        "kmv: sketch entries out of canonical (hash, key) order")
      s.set.add(e)
      prev = e
      i += 1
    }
    require(buf.remaining() == 0, "kmv: trailing bytes after sketch entries")
    s
  }

  /** Pinned estimate rule — exact below k, (k-1)·2^60/h_k at k, with
    * BigInteger arithmetic so the oracle's HUGEINT division replays it
    * exactly. 0 for an empty/unset sketch. */
  def estimate(s: State): Long = {
    val n = s.set.size()
    if (s.k == 0 || n < s.k) n.toLong
    else {
      val hk = math.max(s.set.last().hash, 1L)
      // real sketches can't overflow (k distinct hashes ⇒ h_k ≥ k-1 ⇒
      // estimate ≤ 2^60), but hostile bytes may repeat a tiny hash
      // under k distinct KEYS — fail as the house format error, not a
      // raw ArithmeticException escaping longValueExact
      try java.math.BigInteger.valueOf(s.k - 1L)
        .multiply(java.math.BigInteger.valueOf(HashSpace))
        .divide(java.math.BigInteger.valueOf(hk))
        .longValueExact()
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          "kmv: estimate overflow - not a graft sketch")
      }
    }
  }

  /** The kept keys in ascending (hash, key) order — the sample, as an
    * array for a downstream `posexplode`. Static so generated code and
    * eval share one body. */
  def keysFromBytes(bytes: Array[Byte]): GenericArrayData = {
    val s = deserialize(bytes)
    val out = new Array[Any](s.set.size())
    val it = s.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromBytes(it.next().key); i += 1 }
    new GenericArrayData(out)
  }

  /** Estimate straight off sketch bytes (per-row scalar form). */
  def estimateFromBytes(bytes: Array[Byte]): Long = estimate(deserialize(bytes))

  /** SET-OPERATION kernel (Beyer et al., SIGMOD 2007 §4): from two
    * same-k sketches, the bottom-k union sample L, the number `m` of
    * L's entries present in BOTH input samples, kL = |L|, and the
    * pinned union estimate off L. Every step is sample membership +
    * integer arithmetic over the fixed md5-prefix hash, so the DuckDB
    * oracle replays m, kL, and the estimates bit-for-bit — the sketch
    * algebra's cross-SET leg (the bitmap intersects exactly but needs
    * the key domain; HLL can only union). Mixed k fails loudly
    * ([[reconcileK]]'s contract: a bottom-j of a bottom-k loses the
    * estimator). */
  private[functions] def setOps(a: State, b: State, fn: String): (Long, Long, Long) = {
    // k=0 is the empty-unset sentinel (kmv_merge_sketch over all-NULL
    // input serializes it, deserialize accepts it): treat it as the
    // empty SET identity the rest of the algebra honors — m=0 and the
    // union is the other side — rather than failing the k equality
    if (a.k == 0 && b.k == 0) return (0L, 0L, 0L)
    if (a.k == 0) return (0L, b.set.size().toLong, estimate(b))
    if (b.k == 0) return (0L, a.set.size().toLong, estimate(a))
    require(a.k == b.k,
      s"$fn: sketches with different k (${a.k} vs ${b.k}) - re-sketch one " +
        "side at the other's k")
    val l = new State(a.k)
    l.mergeFrom(a, fn)
    l.mergeFrom(b, fn)
    var m = 0L
    val it = l.set.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (a.set.contains(e) && b.set.contains(e)) m += 1L
    }
    (m, l.set.size().toLong, estimate(l))
  }

  /** Jaccard similarity in integer BASIS POINTS (the house float-free
    * rule): m · 10000 / kL with floor division; 0 when both sketches
    * are empty. */
  def jaccardBp(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val (m, kL, _) = setOps(deserialize(aBytes), deserialize(bBytes), "kmv_jaccard_bp")
    if (kL == 0L) 0L else m * 10000L / kL
  }

  /** Intersection-cardinality estimate: m · U / kL with exact integer
    * arithmetic (U = the union estimate off the bottom-k union sample);
    * 0 when both sketches are empty. Exact whenever the union sample is
    * exact (|A ∪ B| < k). */
  def intersectEstimate(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val (m, kL, u) = setOps(deserialize(aBytes), deserialize(bBytes), "kmv_intersect_estimate")
    if (kL == 0L) 0L
    else java.math.BigInteger.valueOf(m)
      .multiply(java.math.BigInteger.valueOf(u))
      .divide(java.math.BigInteger.valueOf(kL))
      .longValueExact()
  }

  /** K-WAY generalization of [[setOps]] (Beyer SIGMOD 2007 §4 holds
    * for any number of sets): from j ≥ 1 same-k sketches, the bottom-k
    * union sample L over ALL of them, `m` = entries of L present in
    * EVERY input sample, kL = |L|, and the pinned union estimate off
    * L. k=0 empty-unset members contribute nothing to the union and
    * ANNIHILATE the intersection (the empty-SET identity the binary
    * form honors); mixed k fails loudly. Everything stays sample
    * membership + integer arithmetic over the md5-prefix hash, so the
    * oracle replays all three numbers bit-for-bit. */
  private[functions] def setOpsAll(states: Array[State], fn: String): (Long, Long, Long) = {
    require(states.nonEmpty, s"$fn: at least one sketch required")
    val live = states.filter(_.k != 0)
    if (live.isEmpty) return (0L, 0L, 0L)
    val l = new State(0)
    var i = 0
    while (i < live.length) { l.mergeFrom(live(i), fn); i += 1 }
    var m = 0L
    if (live.length == states.length) { // an empty-SET member ⇒ m = 0
      val it = l.set.iterator()
      while (it.hasNext) {
        val e = it.next()
        var all = true
        var j = 0
        while (all && j < live.length) { all = live(j).set.contains(e); j += 1 }
        if (all) m += 1L
      }
    }
    (m, l.set.size().toLong, estimate(l))
  }

  private def statesFromArray(a: org.apache.spark.sql.catalyst.util.ArrayData,
      fn: String): Array[State] = {
    val n = a.numElements()
    require(n > 0, s"$fn: empty sketch array")
    val out = new Array[State](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element → null result (outer-join friendly)
      out(i) = deserialize(a.getBinary(i))
      i += 1
    }
    out
  }

  /** |A₁ ∪ … ∪ Aⱼ| estimate off an array of same-k sketches — shared
    * by eval and generated code; null on a null element. */
  def unionEstimateAll(a: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val states = statesFromArray(a, "kmv_union_estimate")
    if (states == null) null
    else setOpsAll(states, "kmv_union_estimate")._3
  }

  /** |A₁ ∩ … ∩ Aⱼ| estimate (m · U / kL) off an array of same-k
    * sketches — exact whenever the union sample is exact; null on a
    * null element. */
  def intersectEstimateAll(a: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val states = statesFromArray(a, "kmv_intersect_all_estimate")
    if (states == null) null
    else {
      val (m, kL, u) = setOpsAll(states, "kmv_intersect_all_estimate")
      if (kL == 0L) 0L
      else java.math.BigInteger.valueOf(m)
        .multiply(java.math.BigInteger.valueOf(u))
        .divide(java.math.BigInteger.valueOf(kL))
        .longValueExact()
    }
  }

  private[functions] def extractK(e: Expression, fn: String): Int = e match {
    case f if f.foldable => f.eval() match {
      case i: Int => i
      // no silent truncation: a Long k outside the Int range must fail
      // the [1, MaxK] validation with its REAL value, not a wrapped one
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$fn: k must be in [1, $MaxK], got $l")
      case null => throw new IllegalArgumentException(
        s"$fn: k must be a non-null integral literal")
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an integral literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: k must be a foldable integral literal, got $other")
  }

  // ---- Column API ----------------------------------------------------

  /** `df.groupBy(grain).agg(kmv_sketch($"key", 64))` — bottom-64
    * uniform-sample sketch of the distinct keys (binary; string keys —
    * cast first so the oracle hashes the same bytes). */
  def kmv_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchExpr(ColumnBridge.expression(c),
        Literal(k, IntegerType)).toAggregateExpression())

  /** `daily.groupBy(month).agg(kmv_merge_sketch($"sk"))` — bottom-k
    * union of fine sketches into a STORED coarser sketch (bytes
    * identical to sketching the keys directly; k-checked). */
  def kmv_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      KmvMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(kmv_merge_estimate($"sk"))` —
    * distinct-count estimate from merged sketches (exact below k). */
  def kmv_merge_estimate(c: Column): Column =
    ColumnBridge.column(
      KmvMergeEstimateExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `posexplode(kmv_keys($"sk"))` — the sampled keys, smallest hash
    * first (scalar; one row in, one array out). */
  def kmv_keys(c: Column): Column =
    ColumnBridge.column(KmvKeysExpr(ColumnBridge.expression(c)))

  /** `kmv_estimate($"sk")` — the estimate as a per-row scalar. */
  def kmv_estimate(c: Column): Column =
    ColumnBridge.column(KmvEstimateExpr(ColumnBridge.expression(c)))

  /** `kmv_jaccard_bp($"sk_a", $"sk_b")` — Jaccard similarity of the two
    * key sets in integer basis points, per row (segment-similarity
    * matrices from the sketch table). */
  def kmv_jaccard_bp(a: Column, b: Column): Column =
    ColumnBridge.column(
      KmvJaccardBpExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `kmv_intersect_estimate($"sk_a", $"sk_b")` — |A ∩ B| estimate
    * (exact while the union sample is exact), per row. */
  def kmv_intersect_estimate(a: Column, b: Column): Column =
    ColumnBridge.column(
      KmvIntersectEstimateExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `kmv_union_estimate($"sks")` — |A₁ ∪ … ∪ Aⱼ| estimate off an
    * array<binary> of same-k sketches (j-way reach off the sketch
    * table), per row. */
  def kmv_union_estimate(c: Column): Column =
    ColumnBridge.column(KmvUnionEstimateExpr(ColumnBridge.expression(c)))

  /** `kmv_intersect_all_estimate($"sks")` — |A₁ ∩ … ∩ Aⱼ| estimate
    * off an array<binary> of same-k sketches (j-way overlap), per
    * row. */
  def kmv_intersect_all_estimate(c: Column): Column =
    ColumnBridge.column(KmvIntersectAllEstimateExpr(ColumnBridge.expression(c)))
}

/** Shared shell for the j-way array-input scalars: array<binary> in,
  * nullable BIGINT out, real codegen via a static helper (the
  * DdsQuantileOf Object-result pattern — null propagates through the
  * generated path too). */
private[functions] sealed trait KmvArrayScalar extends UnaryExpression {
  /** Fully-qualified static helper the generated code calls. */
  def helper: String
  def evalHelper(a: org.apache.spark.sql.catalyst.util.ArrayData): Any

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<BINARY> of kmv sketches, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    evalHelper(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""Object ${ev.value}_r = $helper($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) ${ev.value}_r).longValue(); }
         |""".stripMargin)
}

case class KmvUnionEstimateExpr(child: Expression) extends KmvArrayScalar {
  override def prettyName: String = "kmv_union_estimate"
  override def helper: String = "graft.functions.Kmv.unionEstimateAll"
  override def evalHelper(a: org.apache.spark.sql.catalyst.util.ArrayData): Any =
    Kmv.unionEstimateAll(a)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionEstimateExpr =
    copy(child = newChild)
}

case class KmvIntersectAllEstimateExpr(child: Expression) extends KmvArrayScalar {
  override def prettyName: String = "kmv_intersect_all_estimate"
  override def helper: String = "graft.functions.Kmv.intersectEstimateAll"
  override def evalHelper(a: org.apache.spark.sql.catalyst.util.ArrayData): Any =
    Kmv.intersectEstimateAll(a)
  override protected def withNewChildInternal(newChild: Expression): KmvIntersectAllEstimateExpr =
    copy(child = newChild)
}

/** Scalar: Jaccard similarity (integer basis points) of two same-k
  * sketches' key sets — the cross-SET question (how similar are two
  * segments' key universes?) answered per row off the sketch table,
  * where HLL can only union and the exact bitmap needs the key domain.
  * Null if either side is null (outer-join friendly); real codegen via
  * the shared static helper. */
case class KmvJaccardBpExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_jaccard_bp requires two BINARY sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_jaccard_bp"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Kmv.jaccardBp(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kmv.jaccardBp($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccardBpExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar: intersection-cardinality estimate of two same-k sketches
  * (m · U / kL, exact integer arithmetic — exact whenever the union
  * sample is exact). Null if either side is null. */
case class KmvIntersectEstimateExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_intersect_estimate requires two BINARY sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect_estimate"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Kmv.intersectEstimate(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kmv.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectEstimateExpr =
    copy(left = newLeft, right = newRight)
}

/** INIT: raw string keys → serialized bottom-k sketch. */
case class KmvSketchExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.State]
  with BinaryLike[Expression] {

  private lazy val k: Int = Kmv.extractK(right, prettyName)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING key column (cast first — the hash must " +
          s"see the exact bytes the oracle hashes), got ${left.dataType.simpleString}")
    else if (!right.foldable ||
        !(right.dataType == IntegerType || right.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral k, got ${right.dataType.simpleString}")
    else try {
      if (k >= 1 && k <= Kmv.MaxK) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be in [1, ${Kmv.MaxK}], got $k")
    } catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override def createAggregationBuffer(): Kmv.State = new Kmv.State(k)

  override def update(buffer: Kmv.State, input: InternalRow): Kmv.State = {
    val v = left.eval(input)
    if (v != null) buffer.addKey(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(b: Kmv.State, other: Kmv.State): Kmv.State = {
    b.mergeFrom(other, prettyName); b
  }

  override def eval(b: Kmv.State): Any = Kmv.serialize(b)

  override def serialize(b: Kmv.State): Array[Byte] = Kmv.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kmv.State = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketchExpr =
    copy(left = newLeft, right = newRight)
}

/** Sketch → SKETCH re-aggregation (the merge_sketch twin): bottom-k
  * union of fine sketches into a STORED coarser sketch — daily samples
  * roll into monthly ones, byte-identical to sketching the keys
  * directly, with fail-loud k reconciliation (a bottom-j of a bottom-k
  * would silently break the estimate rule). */
case class KmvMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.State]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Kmv.State = new Kmv.State(0)

  override def update(buffer: Kmv.State, input: InternalRow): Kmv.State = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.mergeFrom(Kmv.deserialize(bytes), prettyName); buffer
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Kmv.State, other: Kmv.State): Kmv.State = {
    b.mergeFrom(other, prettyName); b
  }

  override def eval(b: Kmv.State): Any = Kmv.serialize(b)

  override def serialize(b: Kmv.State): Array[Byte] = Kmv.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kmv.State = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeSketchExpr =
    copy(child = newChild)
}

/** MERGE: bottom-k union of serialized sketches, eval the pinned
  * estimate (exact below k — oracle-equal to COUNT(DISTINCT) there,
  * and the k-th-hash formula is integer-exact so the oracle replays
  * the ≥ k case too). */
case class KmvMergeEstimateExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.State]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Kmv.State = new Kmv.State(0)

  override def update(buffer: Kmv.State, input: InternalRow): Kmv.State = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        buffer.mergeFrom(Kmv.deserialize(bytes), prettyName); buffer
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Kmv.State, other: Kmv.State): Kmv.State = {
    b.mergeFrom(other, prettyName); b
  }

  override def eval(b: Kmv.State): Any = Kmv.estimate(b)

  override def serialize(b: Kmv.State): Array[Byte] = Kmv.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kmv.State = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeEstimateExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeEstimateExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeEstimateExpr =
    copy(child = newChild)
}

/** Scalar: sketch bytes → the sampled keys (ascending hash order) as
  * array<string>, for `posexplode` into sample rows. Real codegen via
  * the shared static helper (interpreted and compiled paths cannot
  * diverge). */
case class KmvKeysExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def nullSafeEval(v: Any): Any =
    Kmv.keysFromBytes(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kmv.keysFromBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): KmvKeysExpr =
    copy(child = newChild)
}

/** Scalar: sketch bytes → the pinned distinct estimate, per row. */
case class KmvEstimateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def nullSafeEval(v: Any): Any =
    Kmv.estimateFromBytes(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kmv.estimateFromBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimateExpr =
    copy(child = newChild)
}
