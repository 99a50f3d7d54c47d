package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** RELATIVE-ERROR mergeable quantiles over UNBOUNDED continuous
  * domains — the approximate twin of the exact [[Vhist]] leg, exactly
  * as [[Hll]] is the approximate twin of the exact bitmap pair: the
  * DDSketch scheme (Masson, Rim, Lee: "DDSketch: a fast and fully-
  * mergeable quantile sketch with relative-error guarantees", VLDB
  * 2019) — a histogram over LOG-SPACED buckets, so any returned
  * quantile is within a multiplicative `alpha` of the true value.
  *
  * Why it exists: [[Vhist]] is exact but needs an integral domain
  * whose distinct-value count is bounded (its fail-fast ceiling), and
  * its pre-bucket `unit` fixes an ABSOLUTE resolution — one unit
  * cannot serve values spanning many orders of magnitude (request
  * latencies from microseconds to hours, payload sizes from bytes to
  * terabytes). The log bucketing here makes resolution RELATIVE:
  * bucket `i` covers `(gamma^(i-1), gamma^i]` with
  * `gamma = (1+alpha)/(1-alpha)`, so at `alpha = 0.01` the ENTIRE
  * positive double range costs at most ~75k buckets and every
  * quantile answer is within 1% of the truth — P99 at any grain from
  * the sketch table, the fact table scanned once.
  *
  * Full value support: a positive store, a ZERO count, and a mirrored
  * negative store (indexed on |v|); NaN/infinite values FAIL LOUDLY
  * (a quantile over them is meaningless, and silently dropping rows
  * is the corruption this algebra exists to prevent).
  *
  * Determinism (the house rule that makes the gate exact): bucket
  * indexes and estimates use `StrictMath` only — `Math.log/pow` are
  * allowed 1-ulp platform variance, StrictMath is bit-identical
  * everywhere — so sketch bytes and quantile answers are stable
  * across JVMs, partitionings, and merge orders. The quantile rule is
  * the house discrete-lower rank rule (smallest bucket whose
  * cumulative count ≥ ceil(q × N), exact-decimal rank arithmetic),
  * walking negative buckets from most-negative, then zeros, then
  * positive buckets ascending; the answer is the matched bucket's
  * midpoint-in-log-space estimate `2·gamma^i/(gamma+1)` (sign-mirrored
  * for the negative store), which is what carries the ≤ alpha
  * relative-error guarantee.
  *
  * Merge is count ADDITION per bucket (associative, commutative,
  * order-independent) with the same fail-loud parameter reconciliation
  * as [[Vhist]]'s unit tag: `alpha` travels IN the sketch bytes (raw
  * double bits), and merging sketches built at different alphas
  * throws — re-bucketing cannot be done losslessly after the fact.
  * Serialization is canonical: zero count, then each store's buckets
  * in ascending index order — a pure function of (bucket multiset,
  * alpha), stable under any aggregation tree.
  */
object Dds {
  /** Legal alpha range: below 0.0005 the bucket count for the full
    * double range approaches the fail-fast ceiling; above 0.5 the
    * "estimate" is no longer meaningfully a quantile. */
  val MinAlpha: Double = 0.0005
  val MaxAlpha: Double = 0.5

  /** Fail-fast bucket ceiling across both stores, strictly above any
    * legal alpha's worst case: alpha 0.0005 spans ~1.45M buckets PER
    * store over the full double range (ln gamma ≈ 0.001, magnitudes
    * from 4.9e-324 to 1.8e308), so the mirrored two-store worst case
    * is ~2.9M — legal data can NEVER trip this, only corrupt bytes
    * can. */
  val MaxBuckets: Int = 1 << 22

  private[functions] val Magic: Byte = 0x44 // 'D'
  private[functions] val Version: Byte = 1

  type Store = java.util.TreeMap[java.lang.Integer, java.lang.Long]

  /** Sketch state. `alphaBits = 0L` is the unset-PARTIAL sentinel (an
    * empty merge buffer that has not yet seen a sketch — double 0.0 is
    * not a legal alpha, so the sentinel can never collide); it only
    * ever serializes EMPTY. */
  final class DState(var alphaBits: Long) {
    var zero: Long = 0L
    val pos: Store = new java.util.TreeMap[java.lang.Integer, java.lang.Long]()
    val neg: Store = new java.util.TreeMap[java.lang.Integer, java.lang.Long]()
    def isEmpty: Boolean = zero == 0L && pos.isEmpty && neg.isEmpty
    // hot-path cache: ln(gamma) per state, not per row (0.0 = not yet
    // computed; a real ln(gamma) is never 0 because gamma > 1)
    private var lnG: Double = 0.0
    def lnGamma: Double = {
      if (lnG == 0.0)
        lnG = StrictMath.log(Dds.gamma(java.lang.Double.longBitsToDouble(alphaBits)))
      lnG
    }
  }

  def gamma(alpha: Double): Double = (1.0 + alpha) / (1.0 - alpha)

  /** Bucket index for a POSITIVE magnitude: ceil(log_gamma(v)).
    * StrictMath throughout — bit-identical on every platform. */
  def index(v: Double, lnGamma: Double): Int =
    StrictMath.ceil(StrictMath.log(v) / lnGamma).toInt

  /** Bucket i's midpoint-in-log-space estimate `2·gamma^i/(gamma+1)` —
    * within alpha of every value in `(gamma^(i-1), gamma^i]`. The
    * sub-1 factor `2/(gamma+1)` is applied FIRST so a merely-large
    * bucket never overflows through the `2·gamma^i` intermediate
    * (review-caught r12: the naive order threw on sketches the engine
    * itself built from values ≥ ~9e307). Two residual regimes at the
    * very top of the double range:
    *  - buckets up to `index(Double.MaxValue)` are reachable from
    *    LEGAL inputs, but the top bucket's true midpoint
    *    (≈ v·(1+alpha)) can itself exceed Double.MaxValue — the
    *    estimate SATURATES at Double.MaxValue there (relative error
    *    ≤ gamma−1 ≈ 2·alpha for that single bucket instead of alpha;
    *    finite, deterministic, order-preserving). NOTE the explicit
    *    tie: two DISTINCT saturating top buckets both estimate
    *    Double.MaxValue, so quantiles are NON-STRICTLY monotone in
    *    that extreme corner (q1 < q2 can return equal estimates);
    *  - indexes PAST the last finite-double bucket are reachable only
    *    through hostile bytes and stay FAIL-LOUD rather than escaping
    *    as a ±Infinity "quantile".
    * The overflow cutoff `iMax` depends only on gamma, so it is
    * memoized per alpha instead of re-running log/ceil on every
    * saturating call (review-caught r12). */
  def estimate(i: Int, alpha: Double): Double = {
    val g = gamma(alpha)
    val direct = 2.0 / (g + 1.0) * StrictMath.pow(g, i)
    if (!java.lang.Double.isInfinite(direct)) direct
    else {
      val iMax = iMaxCache.computeIfAbsent(
        java.lang.Double.doubleToLongBits(alpha),
        _ => StrictMath.ceil(
          StrictMath.log(Double.MaxValue) / StrictMath.log(g)).toInt)
      require(i <= iMax,
        s"dds: estimate overflows double at bucket $i - not a graft sketch")
      Double.MaxValue
    }
  }

  /** alphaBits → index(Double.MaxValue): one entry per distinct alpha a
    * process ever sketches with (a handful), looked up only on the
    * saturating-overflow path. */
  private val iMaxCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Integer]()

  /** Checked count addition: a hostile-but-structurally-valid sketch
    * carrying near-Long.MAX counts must fail loudly at the add, not
    * wrap silently and corrupt the rank walk. */
  private[functions] def addCount(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch { case _: ArithmeticException =>
      throw new IllegalArgumentException(
        "dds: bucket-count overflow - not a graft sketch")
    }

  private def bump(s: Store, idx: Int, n: Long, total: => Int): Unit = {
    val prev = s.get(idx)
    if (prev eq null) {
      require(total < MaxBuckets,
        s"dds: more than $MaxBuckets buckets — not a graft sketch, or a " +
          "corrupt alpha")
      s.put(idx, n)
    } else s.put(idx, addCount(prev, n))
  }

  /** Add one raw value. NaN/infinite fail loudly. */
  def add(b: DState, v: Double): Unit = {
    require(!java.lang.Double.isNaN(v) && !java.lang.Double.isInfinite(v),
      s"dds: non-finite value $v — filter NaN/Inf before sketching")
    if (v == 0.0) b.zero += 1L
    else {
      val lnG = b.lnGamma
      if (v > 0.0) bump(b.pos, index(v, lnG), 1L, b.pos.size() + b.neg.size())
      else bump(b.neg, index(-v, lnG), 1L, b.pos.size() + b.neg.size())
    }
  }

  /** Fail-loud alpha reconciliation (the [[Vhist.reconcileUnit]]
    * twin): bucket boundaries are a function of alpha, so count-adding
    * buckets across alphas is silent corruption. */
  private[functions] def reconcileAlpha(b: DState, incoming: Long, fn: String): Unit =
    if (incoming != 0L) {
      if (b.alphaBits == 0L) b.alphaBits = incoming
      else require(b.alphaBits == incoming,
        s"$fn: merging sketches with different alphas " +
          s"(${java.lang.Double.longBitsToDouble(b.alphaBits)} vs " +
          s"${java.lang.Double.longBitsToDouble(incoming)}) - re-sketch one " +
          "side at the other's alpha")
    }

  def merge(a: DState, b: DState, fn: String): DState = {
    reconcileAlpha(a, b.alphaBits, fn)
    a.zero = addCount(a.zero, b.zero)
    var it = b.pos.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(a.pos, e.getKey, e.getValue, a.pos.size() + a.neg.size())
    }
    it = b.neg.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(a.neg, e.getKey, e.getValue, a.pos.size() + a.neg.size())
    }
    a
  }

  /** Canonical bytes: alpha bits, zero count, then each store's
    * buckets ascending by index — a pure function of (buckets, alpha).
    * An unset-alpha state serializes only when empty (the identity
    * partial). */
  def serialize(b: DState): Array[Byte] = {
    require(b.alphaBits != 0L || b.isEmpty,
      "dds: internal - unset alpha on a non-empty sketch")
    val n = b.neg.size() + b.pos.size()
    val buf = ByteBuffer.allocate(1 + 1 + 8 + 8 + 4 + 4 + 12 * n)
    buf.put(Magic)
    buf.put(Version)
    buf.putLong(b.alphaBits)
    buf.putLong(b.zero)
    buf.putInt(b.neg.size())
    buf.putInt(b.pos.size())
    var it = b.neg.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); buf.putInt(e.getKey); buf.putLong(e.getValue)
    }
    it = b.pos.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); buf.putInt(e.getKey); buf.putLong(e.getValue)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): DState = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.remaining() >= 26 && buf.get() == Magic,
      "dds: not a graft DDSketch (bad magic)")
    val v = buf.get()
    require(v == Version, s"dds: unsupported sketch version $v")
    val alphaBits = buf.getLong()
    if (alphaBits != 0L) {
      val alpha = java.lang.Double.longBitsToDouble(alphaBits)
      require(!java.lang.Double.isNaN(alpha) &&
        alpha >= MinAlpha && alpha <= MaxAlpha,
        s"dds: bad sketch alpha $alpha")
    }
    val zero = buf.getLong()
    require(zero >= 0L, s"dds: negative zero-count $zero")
    val nNeg = buf.getInt()
    val nPos = buf.getInt()
    // overflow-safe: nNeg + nPos as a plain int sum wraps negative for
    // hostile 2^30-sized counts and would slip past a <= MaxBuckets
    // check into the entry loops
    require(nNeg >= 0 && nNeg <= MaxBuckets && nPos >= 0 &&
      nPos <= MaxBuckets - nNeg,
      s"dds: bad bucket counts ($nNeg, $nPos)")
    // alpha-0 is the unset-partial sentinel and only ever serializes
    // EMPTY (the vhist unit-0 rule): hostile sentinel bytes carrying
    // buckets would slip past reconcileAlpha into any tier
    require(alphaBits != 0L || (zero == 0L && nNeg == 0 && nPos == 0),
      "dds: alpha-0 sketch carrying data is not a graft sketch")
    val b = new DState(alphaBits)
    b.zero = zero
    var prev = Long.MinValue
    var i = 0
    while (i < nNeg) {
      require(buf.remaining() >= 12, "dds: truncated sketch entry")
      val idx = buf.getInt(); val cnt = buf.getLong()
      require(idx > prev, s"dds: buckets not canonical at index $idx")
      require(cnt > 0L, s"dds: non-positive count $cnt for bucket $idx")
      b.neg.put(idx, cnt)
      prev = idx
      i += 1
    }
    prev = Long.MinValue
    i = 0
    while (i < nPos) {
      require(buf.remaining() >= 12, "dds: truncated sketch entry")
      val idx = buf.getInt(); val cnt = buf.getLong()
      require(idx > prev, s"dds: buckets not canonical at index $idx")
      require(cnt > 0L, s"dds: non-positive count $cnt for bucket $idx")
      b.pos.put(idx, cnt)
      prev = idx
      i += 1
    }
    // trailing junk would silently ride along inside "canonical" bytes,
    // breaking the pure-function-of-the-set contract (the kmv rule)
    require(buf.remaining() == 0, "dds: trailing bytes after sketch buckets")
    b
  }

  /** The house rank rule on the bucketed multiset: smallest bucket (in
    * VALUE order — negatives from most-negative, zeros, positives
    * ascending) whose cumulative count ≥ max(1, ceil(q × N)); null on
    * empty. Returns the matched bucket's estimate, which is within
    * alpha of the true rank-r value because log bucketing preserves
    * value order. */
  def quantile(b: DState, q: Double): Any = {
    var total = b.zero
    var it = b.pos.values().iterator()
    while (it.hasNext) total = addCount(total, it.next())
    it = b.neg.values().iterator()
    while (it.hasNext) total = addCount(total, it.next())
    if (total == 0L) null
    else {
      val target = java.math.BigDecimal.valueOf(q)
        .multiply(java.math.BigDecimal.valueOf(total))
        .setScale(0, java.math.RoundingMode.CEILING).longValueExact()
      val tgt = math.max(1L, target)
      val alpha = java.lang.Double.longBitsToDouble(b.alphaBits)
      var cum = 0L
      // negative store: descending index = ascending value
      val negIt = b.neg.descendingMap().entrySet().iterator()
      while (negIt.hasNext) {
        val e = negIt.next()
        cum += e.getValue
        if (cum >= tgt) return -estimate(e.getKey, alpha)
      }
      cum += b.zero
      if (cum >= tgt) return 0.0
      val posIt = b.pos.entrySet().iterator()
      while (posIt.hasNext) {
        val e = posIt.next()
        cum += e.getValue
        if (cum >= tgt) return estimate(e.getKey, alpha)
      }
      throw new IllegalStateException("dds: rank walk exhausted buckets")
    }
  }

  /** Scalar read of a STORED sketch: q-quantile estimate straight off
    * the bytes, per row (the cms_est/kmv_estimate pattern — no
    * re-aggregation to read a sketch table). Null for the canonical
    * empty sketch. Shared by eval and generated code. */
  def quantileFromBytes(bytes: Array[Byte], q: Double): Any =
    quantile(deserialize(bytes), q)

  /** Multi-quantile read: ONE deserialize, k rank walks — the
    * fact-sized probe pattern's fix (r11 verdict #4): `dds_quantile_of`
    * pays the O(sketch) decode per call, so a P50/P95/P99 dashboard
    * row cost three decodes; this costs one. Null elements for an
    * empty sketch. Shared by eval and generated code. */
  def quantilesFromBytes(bytes: Array[Byte], qs: Array[Double])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val st = deserialize(bytes)
    val out = new Array[Any](qs.length)
    var i = 0
    while (i < qs.length) { out(i) = quantile(st, qs(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private[functions] def extractQs(e: Expression, fn: String): Array[Double] = {
    val elemType = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _)
          if et == DoubleType ||
            et.isInstanceOf[org.apache.spark.sql.types.DecimalType] => et
      case other => throw new IllegalArgumentException(
        s"$fn: quantiles must be ARRAY<DOUBLE/DECIMAL>, got ${other.simpleString}")
    }
    require(e.foldable, s"$fn: quantiles must be a foldable ARRAY literal")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val n = a.numElements()
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          require(!a.isNullAt(i), s"$fn: quantiles must be non-null literals")
          out(i) = a.get(i, elemType) match {
            case d: Double => d
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new IllegalArgumentException(
              s"$fn: quantile elements must be DOUBLE/DECIMAL, got $other")
          }
          i += 1
        }
        out
      case null => throw new IllegalArgumentException(
        s"$fn: quantile array must be a non-null literal")
      case other => throw new IllegalArgumentException(
        s"$fn: quantile array must be an ARRAY literal, got $other")
    }
  }

  private[functions] def extractAlpha(e: Expression, fn: String): Double = e match {
    case f if f.foldable => f.eval() match {
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case null => throw new IllegalArgumentException(
        s"$fn: alpha must be a non-null literal")
      case other => throw new IllegalArgumentException(
        s"$fn: alpha must be a DOUBLE/DECIMAL literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: alpha must be a foldable DOUBLE literal, got $other")
  }

  private[functions] def checkAlpha(fn: String, alpha: Double): TypeCheckResult =
    if (alpha >= MinAlpha && alpha <= MaxAlpha) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn: alpha must be in [$MinAlpha, $MaxAlpha], got $alpha")

  private[functions] def checkDouble(fn: String, dt: DataType): TypeCheckResult =
    if (dt == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires a DOUBLE value column (cast integrals explicitly), " +
        s"got ${dt.simpleString}")

  private[functions] def checkQLiteral(e: Expression, fn: String): TypeCheckResult =
    if (!e.foldable || !(e.dataType == DoubleType ||
        e.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
      TypeCheckResult.TypeCheckFailure(
        s"$fn requires a foldable DOUBLE/DECIMAL quantile, got ${e.dataType.simpleString}")
    else try Vhist.checkQ(fn, Vhist.extractQ(e, fn))
    catch { case ex: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(ex.getMessage) }

  // ---- Column API ----------------------------------------------------

  /** `df.groupBy(grain).agg(dds_sketch($"latency", 0.01))` — the
    * re-aggregable relative-error histogram (binary); alpha travels in
    * the bytes. */
  def dds_sketch(c: Column, alpha: Double): Column =
    ColumnBridge.column(
      DdsSketchExpr(ColumnBridge.expression(c),
        Literal(alpha, DoubleType)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(dds_merge_quantile($"sk", 0.99))`
    * — the q-quantile estimate (within the sketches' alpha) from
    * count-added sketches. */
  def dds_merge_quantile(c: Column, q: Double): Column =
    ColumnBridge.column(
      DdsMergeQuantileExpr(ColumnBridge.expression(c),
        Literal(q, DoubleType)).toAggregateExpression())

  /** `daily.groupBy(month).agg(dds_merge_sketch($"sk"))` — roll fine
    * sketches into a STORED coarser sketch table (count addition;
    * bytes identical to sketching the values directly). */
  def dds_merge_sketch(c: Column): Column =
    ColumnBridge.column(
      DdsMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `df.agg(dds_quantile($"latency", 0.01, 0.5))` — one-shot estimate
    * over raw values (INIT + quantile fused). */
  def dds_quantile(c: Column, alpha: Double, q: Double): Column =
    ColumnBridge.column(
      DdsQuantileExpr(ColumnBridge.expression(c),
        Literal(alpha, DoubleType), Literal(q, DoubleType)).toAggregateExpression())

  /** `dds_quantile_of($"sk", 0.99)` — the q-quantile estimate as a
    * per-row SCALAR off stored sketch bytes (reading a sketch table
    * without re-aggregation). */
  def dds_quantile_of(c: Column, q: Double): Column =
    ColumnBridge.column(
      DdsQuantileOfExpr(ColumnBridge.expression(c), Literal(q, DoubleType)))

  /** `dds_quantiles($"sk", Seq(0.5, 0.95, 0.99))` — k quantile
    * estimates off stored sketch bytes with ONE decode (the
    * multi-probe fix for fact-sized reads: the P50/P95/P99 dashboard
    * row stops paying three O(sketch) deserializes). */
  def dds_quantiles(c: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(
      DdsQuantilesExpr(ColumnBridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.CreateArray(
          qs.map(Literal(_, DoubleType)))))
}

/** Scalar: sketch bytes → ARRAY of q-quantile estimates with one
  * decode — [[DdsQuantileOfExpr]]'s multi-q form. The quantile array
  * is extracted at ANALYSIS (foldable literal, each q range-checked);
  * null array elements for the canonical empty sketch. Real codegen
  * via the shared static helper and a referenced double[] constant. */
case class DdsQuantilesExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private lazy val qs: Array[Double] = Dds.extractQs(right, prettyName)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "dds_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkBinary(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else try {
      val bad = qs.find(q => q < 0.0 || q > 1.0)
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: quantile must be in [0, 1], got ${bad.get}")
    } catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override protected def nullSafeEval(sk: Any, _qs: Any): Any =
    Dds.quantilesFromBytes(sk.asInstanceOf[Array[Byte]], qs)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val qsRef = ctx.addReferenceObj("qs", qs, "double[]")
    nullSafeCodeGen(ctx, ev, (sk, _) =>
      s"${ev.value} = graft.functions.Dds.quantilesFromBytes($sk, $qsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdsQuantilesExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar: sketch bytes → q-quantile estimate, per row (null for the
  * canonical empty sketch). Real codegen via the shared static helper
  * — interpreted and compiled paths cannot diverge. `q` is extracted
  * at ANALYSIS (like every other Dds/Vhist expression), never
  * evaluated per row — a SQL `0.99` parses as DECIMAL(2,2), and
  * evaluating the child would hand that Decimal to the double
  * parameter (ClassCastException in eval, Janino mismatch in
  * codegen). */
case class DdsQuantileOfExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private lazy val q: Double = Vhist.extractQ(right, prettyName)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dds_quantile_of"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkBinary(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else Dds.checkQLiteral(right, prettyName)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Dds.quantileFromBytes(l.asInstanceOf[Array[Byte]], q)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // embed the analysis-time q exactly (raw bits — Double.toString
    // round-trips, but bits are unambiguous), ignore the child's code
    val qBits = java.lang.Double.doubleToLongBits(q)
    nullSafeCodeGen(ctx, ev, (sk, _) =>
      s"""Object ${ev.value}_r = graft.functions.Dds.quantileFromBytes(
         |  $sk, java.lang.Double.longBitsToDouble(${qBits}L));
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) ${ev.value}_r).doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdsQuantileOfExpr =
    copy(left = newLeft, right = newRight)
}

/** INIT: raw DOUBLE values → serialized DDSketch at the pinned alpha. */
case class DdsSketchExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Dds.DState]
  with BinaryLike[Expression] {

  private lazy val alpha: Double = Dds.extractAlpha(right, prettyName)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "dds_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = Dds.checkDouble(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (!right.foldable || !(right.dataType == DoubleType ||
        right.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable DOUBLE alpha, got ${right.dataType.simpleString}")
    else try Dds.checkAlpha(prettyName, alpha)
    catch { case e: IllegalArgumentException =>
      TypeCheckResult.TypeCheckFailure(e.getMessage) }
  }

  override def createAggregationBuffer(): Dds.DState =
    new Dds.DState(java.lang.Double.doubleToLongBits(alpha))

  override def update(buffer: Dds.DState, input: InternalRow): Dds.DState = {
    val v = left.eval(input)
    if (v != null) Dds.add(buffer, v.asInstanceOf[Double])
    buffer
  }

  override def merge(b: Dds.DState, other: Dds.DState): Dds.DState =
    Dds.merge(b, other, prettyName)

  override def eval(b: Dds.DState): Any = Dds.serialize(b)

  override def serialize(b: Dds.DState): Array[Byte] = Dds.serialize(b)
  override def deserialize(bytes: Array[Byte]): Dds.DState =
    Dds.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdsSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdsSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdsSketchExpr =
    copy(left = newLeft, right = newRight)
}

/** MERGE: count-add sketches, eval the q-quantile estimate (DOUBLE,
  * within the sketches' alpha). Null sketches ignored; empty merged
  * state → null; mixed alphas fail loudly. */
case class DdsMergeQuantileExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Dds.DState]
  with BinaryLike[Expression] {

  private lazy val q: Double = Vhist.extractQ(right, prettyName)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dds_merge_quantile"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkBinary(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else Dds.checkQLiteral(right, prettyName)
  }

  override def createAggregationBuffer(): Dds.DState = new Dds.DState(0L)

  override def update(buffer: Dds.DState, input: InternalRow): Dds.DState = {
    left.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => Dds.merge(buffer, Dds.deserialize(bytes), prettyName)
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Dds.DState, other: Dds.DState): Dds.DState =
    Dds.merge(b, other, prettyName)

  override def eval(b: Dds.DState): Any = Dds.quantile(b, q)

  override def serialize(b: Dds.DState): Array[Byte] = Dds.serialize(b)
  override def deserialize(bytes: Array[Byte]): Dds.DState =
    Dds.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdsMergeQuantileExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdsMergeQuantileExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdsMergeQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** Sketch → SKETCH re-aggregation (the stored-tier leg): count-add
  * fine sketches into a coarser STORED sketch, bytes identical to
  * sketching the values directly. An empty merge emits the canonical
  * empty (alpha-unset) sketch — the merge identity downstream. */
case class DdsMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Dds.DState]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "dds_merge_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): Dds.DState = new Dds.DState(0L)

  override def update(buffer: Dds.DState, input: InternalRow): Dds.DState = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => Dds.merge(buffer, Dds.deserialize(bytes), prettyName)
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: Dds.DState, other: Dds.DState): Dds.DState =
    Dds.merge(b, other, prettyName)

  override def eval(b: Dds.DState): Any = Dds.serialize(b)

  override def serialize(b: Dds.DState): Array[Byte] = Dds.serialize(b)
  override def deserialize(bytes: Array[Byte]): Dds.DState =
    Dds.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdsMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdsMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DdsMergeSketchExpr =
    copy(child = newChild)
}

/** One-shot: raw values → q-quantile estimate (INIT + quantile fused). */
case class DdsQuantileExpr(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Dds.DState]
  with TernaryLike[Expression] {

  private lazy val alpha: Double = Dds.extractAlpha(second, prettyName)
  private lazy val q: Double = Vhist.extractQ(third, prettyName)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dds_quantile"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = Dds.checkDouble(prettyName, first.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else {
      val a = try Dds.checkAlpha(prettyName, alpha)
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage) }
      if (a != TypeCheckResult.TypeCheckSuccess) a
      else Dds.checkQLiteral(third, prettyName)
    }
  }

  override def createAggregationBuffer(): Dds.DState =
    new Dds.DState(java.lang.Double.doubleToLongBits(alpha))

  override def update(buffer: Dds.DState, input: InternalRow): Dds.DState = {
    val v = first.eval(input)
    if (v != null) Dds.add(buffer, v.asInstanceOf[Double])
    buffer
  }

  override def merge(b: Dds.DState, other: Dds.DState): Dds.DState =
    Dds.merge(b, other, prettyName)

  override def eval(b: Dds.DState): Any = Dds.quantile(b, q)

  override def serialize(b: Dds.DState): Array[Byte] = Dds.serialize(b)
  override def deserialize(bytes: Array[Byte]): Dds.DState =
    Dds.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdsQuantileExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdsQuantileExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DdsQuantileExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
