package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns — the inner loop
  * of the similarity family (cosine top-k, IVF probe scoring,
  * embedding near-dup). Semantically identical to the declarative
  * higher-order form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,v) => acc+v)`
  * including its left-to-right fold order and null behavior (null when
  * the arrays differ in length — zip_with pads with null — or any
  * paired element is null), so swapping it in cannot move a single
  * bit of any oracle-checked score. The HOF form interprets two
  * lambdas and materializes a zipped intermediate array per pair; this
  * is one primitive loop that stays inside whole-stage codegen —
  * the difference is O(pairs x dim) allocations on the ANN hot path.
  */
object DotProduct {

  /** True when the HOF formulation would yield NULL: length mismatch
    * or any null element on either side. */
  def nullsOrMismatch(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Left-to-right fold `((0 + a0*b0) + a1*b1) + ...` — exactly the
    * `aggregate` evaluation order, so doubles come out bit-identical. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType/ImplicitCastInputTypes are private[sql] in Spark 4,
  // so the type contract is enforced here; callers cast float arrays
  // explicitly (as the Similarity operators do).
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).collect {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != DoubleType => t.catalogString
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> arguments, got ${bad.mkString(", ")}")
  }

  override def dataType: DataType = DoubleType
  // null also on length mismatch / null elements, not only null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (DotProduct.nullsOrMismatch(x, y)) null else DotProduct.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if (graft.functions.DotProduct.nullsOrMismatch($a, $b)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.DotProduct.dot($a, $b);
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
