package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** DICTIONARY-IDENTITY-tagged exact bitmap sketches — the
  * params-in-bytes discipline (vhist's unit, dds's alpha, kmv's k)
  * applied to the one seam of the algebra that lacked it.
  *
  * The hazard this closes: a bitmap over
  * [[graft.operators.Dictionary]] codes is only meaningful under the
  * key→code mapping that produced it. [[BitmapSketchExpr]] bytes carry
  * no record of WHICH dictionary generation coded their bits, so
  * merging sketches coded by two independently-built dictionaries —
  * or by a dictionary that was REBUILT (re-ranked) instead of extended
  * with [[graft.operators.Dictionary.encodeIncremental]] — silently
  * aliases two different keys onto one bit and mis-counts with no
  * require anywhere. This family embeds the dictionary's lineage id
  * (the `dict_id` column every dictionary carries) in the sketch bytes
  * ([[Bitmap64.serializeTagged]], V2 wire format) and reconciles it
  * FAIL-LOUD at every merge and intersection: same-lineage sketches
  * (one dictionary, any number of `encodeIncremental` extensions —
  * codes frozen bit-for-bit) merge exactly; different lineages throw.
  *
  * The id is a 64-bit content hash of the FIRST generation's key set
  * (order-independent, deterministic — [[graft.operators.Dictionary]]
  * scaladoc), preserved across extensions: a corruption GUARD with a
  * 2^-64 collision floor, not an identity proof. The one divergence it
  * cannot see is two sketches coded by SIBLING extensions of one
  * lineage (same first generation, different appended keys) — forking
  * a dictionary is outside the `encodeIncremental` contract and
  * documented there.
  *
  * Plain and coded tiers can never mix silently: V1 readers reject V2
  * bytes loudly and vice versa ([[Bitmap64.deserializeTagged]]).
  */
object CodedBitmap {

  /** Merge buffer: the bitmap plus the dict id the sketches agreed on
    * (`null` = unset, nothing coded seen yet). */
  final class CodedBm(var id: java.lang.Long, val bm: Bitmap64) {
    def this() = this(null, new Bitmap64())
  }

  private[functions] def reconcileId(b: CodedBm, incoming: java.lang.Long,
      fn: String): Unit =
    if (incoming ne null) {
      if (b.id eq null) b.id = incoming
      else require(b.id.longValue() == incoming.longValue(),
        s"$fn: merging sketches coded by different dictionaries (dict_id " +
          s"${b.id} vs $incoming) - their codes do not share a key mapping; " +
          "extend ONE lineage with Dictionary.encodeIncremental instead of " +
          "rebuilding or mixing dictionaries")
    }

  // private[graft] (not [functions]): the streaming coded tier
  // (Streams.dailyCodedSketchStream, gate e27) keeps its state in this
  // exact wire format so a checkpoint and a stored sketch column share
  // one validation path — same rule as every other leg's serialize.
  private[graft] def serializeBuf(b: CodedBm): Array[Byte] =
    b.bm.serializeTagged(b.id)

  private[graft] def deserializeBuf(bytes: Array[Byte]): CodedBm = {
    val (id, bm) = Bitmap64.deserializeTagged(bytes)
    new CodedBm(id, bm)
  }

  private[functions] def mergeBytes(b: CodedBm, bytes: Array[Byte],
      fn: String): CodedBm = {
    val (id, bm) = Bitmap64.deserializeTagged(bytes)
    reconcileId(b, id, fn)
    b.bm.or(bm)
    b
  }

  /** Exact |A ∩ B| of two CODED sketches with id reconciliation —
    * shared by eval and generated code. */
  def andCount(l: Array[Byte], r: Array[Byte]): Long = {
    val (idL, bmL) = Bitmap64.deserializeTagged(l)
    val (idR, bmR) = Bitmap64.deserializeTagged(r)
    require((idL eq null) || (idR eq null) || idL.longValue() == idR.longValue(),
      s"bitmap_and_count_coded: sketches coded by different dictionaries " +
        s"(dict_id $idL vs $idR) - their codes do not share a key mapping")
    Bitmap64.andCardinality(bmL, bmR)
  }

  /** Exact |A \ B| of two CODED sketches with id reconciliation (r13,
    * verdict #6 — the day-over-day churn question for string-keyed
    * domains): same lineage contract as [[andCount]]. Shared by eval
    * and generated code. */
  def andNotCount(l: Array[Byte], r: Array[Byte]): Long = {
    val (idL, bmL) = Bitmap64.deserializeTagged(l)
    val (idR, bmR) = Bitmap64.deserializeTagged(r)
    require((idL eq null) || (idR eq null) || idL.longValue() == idR.longValue(),
      s"bitmap_andnot_count_coded: sketches coded by different dictionaries " +
        s"(dict_id $idL vs $idR) - their codes do not share a key mapping")
    Bitmap64.andNotCardinality(bmL, bmR)
  }

  /** Largest set code of a CODED sketch (boxed; null when empty) — the
    * [[graft.operators.Dictionary.auditCodedTier]] probe: a stored
    * coded tier is in range iff max set code < |dictionary|. Shared by
    * eval and generated code. */
  def maxCode(bytes: Array[Byte]): Any =
    Bitmap64.deserializeTagged(bytes)._2.maxKeyOrNull

  /** The dictionary-lineage id embedded in CODED sketch bytes (boxed;
    * null for the unset-empty sentinel) — lets SQL/DataFrame audits
    * read the tag without a merge. Shared by eval and generated
    * code. */
  def dictId(bytes: Array[Byte]): Any = Bitmap64.deserializeTagged(bytes)._1

  // ---- Column API ----------------------------------------------------

  /** `coded.groupBy(grain).agg(bitmap_sketch_coded($"code", $"dict_id"))`
    * — the re-aggregable exact distinct sketch whose bytes carry the
    * dictionary lineage that coded them. */
  def bitmap_sketch_coded(code: Column, dictId: Column): Column =
    ColumnBridge.column(
      CodedBitmapSketchExpr(ColumnBridge.expression(code),
        ColumnBridge.expression(dictId)).toAggregateExpression())

  /** `sketches.groupBy(coarser).agg(bitmap_merge_count_coded($"sk"))` —
    * exact distinct count from OR-merged coded sketches; lineages
    * reconciled fail-loud. */
  def bitmap_merge_count_coded(c: Column): Column =
    ColumnBridge.column(
      CodedBitmapMergeCountExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `daily.groupBy(month).agg(bitmap_merge_sketch_coded($"sk"))` —
    * roll fine coded sketches into a STORED coarser coded sketch
    * (bytes identical to sketching the coded facts directly; lineage
    * tag preserved and reconciled). */
  def bitmap_merge_sketch_coded(c: Column): Column =
    ColumnBridge.column(
      CodedBitmapMergeSketchExpr(ColumnBridge.expression(c)).toAggregateExpression())

  /** `bitmap_and_count_coded($"sk_a", $"sk_b")` — exact |A ∩ B| of two
    * coded sketches, per row, lineage-checked. */
  def bitmap_and_count_coded(a: Column, b: Column): Column =
    ColumnBridge.column(
      CodedBitmapAndCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `bitmap_andnot_count_coded($"sk_a", $"sk_b")` — exact |A \ B| of
    * two coded sketches, per row, lineage-checked (new/churned string
    * keys from the coded sketch table). */
  def bitmap_andnot_count_coded(a: Column, b: Column): Column =
    ColumnBridge.column(
      CodedBitmapAndNotCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `bitmap_max_code_coded($"sk")` — largest set code in the coded
    * sketch (null when empty): the auditCodedTier range probe. */
  def bitmap_max_code_coded(c: Column): Column =
    ColumnBridge.column(CodedBitmapMaxCodeExpr(ColumnBridge.expression(c)))

  /** `bitmap_dict_id_coded($"sk")` — the lineage id embedded in the
    * coded sketch bytes (null for the unset-empty sentinel). */
  def bitmap_dict_id_coded(c: Column): Column =
    ColumnBridge.column(CodedBitmapDictIdExpr(ColumnBridge.expression(c)))
}

/** INIT: (code, dict_id) rows → serialized CODED sketch. Null codes
  * are skipped (the bitmap family's null rule); a non-null code with a
  * NULL dict_id fails loudly — an unidentified code is exactly the
  * corruption the tag exists to prevent. Rows disagreeing on dict_id
  * within one group fail loudly too. */
case class CodedBitmapSketchExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CodedBitmap.CodedBm]
  with BinaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_sketch_coded"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = BitmapKey.checkIntegral(prettyName, left.dataType)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT dict_id column (the Dictionary " +
          s"identity), got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): CodedBitmap.CodedBm =
    new CodedBitmap.CodedBm()

  override def update(buffer: CodedBitmap.CodedBm,
      input: InternalRow): CodedBitmap.CodedBm = {
    val v = left.eval(input)
    if (v != null) {
      val id = right.eval(input)
      require(id != null,
        s"$prettyName: NULL dict_id for code $v - codes must travel with " +
          "their dictionary identity (Dictionary.encode attaches it)")
      CodedBitmap.reconcileId(buffer,
        java.lang.Long.valueOf(id.asInstanceOf[Long]), prettyName)
      buffer.bm.add(BitmapKey.toLong(v))
    }
    buffer
  }

  override def merge(b: CodedBitmap.CodedBm,
      other: CodedBitmap.CodedBm): CodedBitmap.CodedBm = {
    CodedBitmap.reconcileId(b, other.id, prettyName)
    b.bm.or(other.bm)
    b
  }

  override def eval(b: CodedBitmap.CodedBm): Any = CodedBitmap.serializeBuf(b)

  override def serialize(b: CodedBitmap.CodedBm): Array[Byte] =
    CodedBitmap.serializeBuf(b)
  override def deserialize(bytes: Array[Byte]): CodedBitmap.CodedBm =
    CodedBitmap.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CodedBitmapSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CodedBitmapSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodedBitmapSketchExpr =
    copy(left = newLeft, right = newRight)
}

/** MERGE → count: OR coded sketches (lineage-reconciled), return the
  * merged cardinality. Null sketches (outer joins) ignored; PLAIN
  * bitmap_sketch bytes fail loudly. */
case class CodedBitmapMergeCountExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CodedBitmap.CodedBm]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge_count_coded"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): CodedBitmap.CodedBm =
    new CodedBitmap.CodedBm()

  override def update(buffer: CodedBitmap.CodedBm,
      input: InternalRow): CodedBitmap.CodedBm = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => CodedBitmap.mergeBytes(buffer, bytes, prettyName)
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: CodedBitmap.CodedBm,
      other: CodedBitmap.CodedBm): CodedBitmap.CodedBm = {
    CodedBitmap.reconcileId(b, other.id, prettyName)
    b.bm.or(other.bm)
    b
  }

  override def eval(b: CodedBitmap.CodedBm): Any = b.bm.cardinality

  override def serialize(b: CodedBitmap.CodedBm): Array[Byte] =
    CodedBitmap.serializeBuf(b)
  override def deserialize(bytes: Array[Byte]): CodedBitmap.CodedBm =
    CodedBitmap.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CodedBitmapMergeCountExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CodedBitmapMergeCountExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CodedBitmapMergeCountExpr =
    copy(child = newChild)
}

/** MERGE → sketch (the stored-tier leg): OR coded sketches into a
  * STORED coarser CODED sketch — bytes identical to sketching the
  * coded facts directly, lineage tag preserved; an all-null/empty
  * merge emits the canonical empty untagged-V2 sketch (the merge
  * identity downstream). */
case class CodedBitmapMergeSketchExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CodedBitmap.CodedBm]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge_sketch_coded"

  override def checkInputDataTypes(): TypeCheckResult =
    BitmapKey.checkBinary(prettyName, child.dataType)

  override def createAggregationBuffer(): CodedBitmap.CodedBm =
    new CodedBitmap.CodedBm()

  override def update(buffer: CodedBitmap.CodedBm,
      input: InternalRow): CodedBitmap.CodedBm = {
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => CodedBitmap.mergeBytes(buffer, bytes, prettyName)
      case other => throw new IllegalArgumentException(
        s"$prettyName requires a binary sketch, got ${other.getClass.getSimpleName}")
    }
  }

  override def merge(b: CodedBitmap.CodedBm,
      other: CodedBitmap.CodedBm): CodedBitmap.CodedBm = {
    CodedBitmap.reconcileId(b, other.id, prettyName)
    b.bm.or(other.bm)
    b
  }

  override def eval(b: CodedBitmap.CodedBm): Any = CodedBitmap.serializeBuf(b)

  override def serialize(b: CodedBitmap.CodedBm): Array[Byte] =
    CodedBitmap.serializeBuf(b)
  override def deserialize(bytes: Array[Byte]): CodedBitmap.CodedBm =
    CodedBitmap.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CodedBitmapMergeSketchExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CodedBitmapMergeSketchExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CodedBitmapMergeSketchExpr =
    copy(child = newChild)
}

/** Scalar exact |A ∩ B| over two CODED sketches, lineage-checked per
  * row. Null if either side is null (outer-join friendly). Real
  * codegen via the shared static helper — interpreted and compiled
  * paths cannot diverge. */
case class CodedBitmapAndCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_and_count_coded requires two BINARY coded sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count_coded"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CodedBitmap.andCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CodedBitmap.andCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodedBitmapAndCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar exact |A \ B| over two CODED sketches, lineage-checked per
  * row — [[CodedBitmapAndCountExpr]]'s set-difference twin (the an46
  * churn question for string-keyed domains). Null if either side is
  * null. Real codegen via the shared static helper. */
case class CodedBitmapAndNotCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_andnot_count_coded requires two BINARY coded sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_andnot_count_coded"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CodedBitmap.andNotCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CodedBitmap.andNotCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodedBitmapAndNotCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Shared shell for the per-sketch CODED readers (max code / lineage
  * id): binary in, nullable BIGINT out, real codegen via a static
  * helper returning a boxed-or-null Object (the KmvArrayScalar
  * pattern — null propagates through the generated path too). */
private[functions] sealed trait CodedBitmapReader
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  /** Fully-qualified static helper the generated code calls. */
  def helper: String
  def evalHelper(bytes: Array[Byte]): Any

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY coded sketch, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    evalHelper(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""Object ${ev.value}_r = $helper($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) ${ev.value}_r).longValue(); }
         |""".stripMargin)
}

case class CodedBitmapMaxCodeExpr(child: Expression) extends CodedBitmapReader {
  override def prettyName: String = "bitmap_max_code_coded"
  override def helper: String = "graft.functions.CodedBitmap.maxCode"
  override def evalHelper(bytes: Array[Byte]): Any = CodedBitmap.maxCode(bytes)
  override protected def withNewChildInternal(newChild: Expression): CodedBitmapMaxCodeExpr =
    copy(child = newChild)
}

case class CodedBitmapDictIdExpr(child: Expression) extends CodedBitmapReader {
  override def prettyName: String = "bitmap_dict_id_coded"
  override def helper: String = "graft.functions.CodedBitmap.dictId"
  override def evalHelper(bytes: Array[Byte]): Any = CodedBitmap.dictId(bytes)
  override protected def withNewChildInternal(newChild: Expression): CodedBitmapDictIdExpr =
    copy(child = newChild)
}
