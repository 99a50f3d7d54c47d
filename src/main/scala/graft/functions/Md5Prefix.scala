package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5-prefix hash: exactly `conv(substring(md5(x), 1, N), 16,
  * 10)` for N <= 15, computed straight from the digest bytes — no
  * 32-char hex string is materialized, substring'd, or re-parsed per
  * value. This is the per-word hot path of the MinHash/SimHash dedup
  * operators (one call per word INSTANCE of the corpus), so the saved
  * allocations are O(corpus tokens). The oracle SQL keeps the
  * '0x'||substr(md5(..)) formulation — values are bit-identical by
  * construction, which the DuckDB gate confirms on every run.
  */
object Md5Prefix {

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point used by both eval and generated code. */
  def prefix(s: UTF8String, hexDigits: Int): Long = {
    val md = mdTL.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    val full = hexDigits >> 1
    var i = 0
    while (i < full) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    // an odd digit count takes the high nibble of the next byte, the
    // way a hex-string prefix of odd length does
    if ((hexDigits & 1) == 1) v = (v << 4) | ((digest(full) & 0xf0L) >>> 4)
    v
  }

  /** Column-API entry point. */
  def md5_prefix(c: Column, hexDigits: Int): Column =
    ColumnBridge.column(Md5PrefixExpr(ColumnBridge.expression(c), hexDigits))
}

case class Md5PrefixExpr(child: Expression, hexDigits: Int) extends UnaryExpression {
  require(hexDigits > 0 && hexDigits <= 15,
    "hexDigits must fit a positive long (1..15 hex digits = up to 60 bits)")

  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Md5Prefix.prefix(v.asInstanceOf[UTF8String], hexDigits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix.prefix($c, $hexDigits)")
  override protected def withNewChildInternal(newChild: Expression): Md5PrefixExpr =
    copy(child = newChild)
}
