package graft.functions

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the reference's `sanitize_text`/`decode_text`
  * (ScienceDirect/ScienceDirect.py:440-455, :150-156; IEEE/IEEE.py:
  * 387-402) recursively fixes strings that were UTF-8 bytes mis-read
  * as Latin-1 ("cafÃ©" → "café").
  *
  * No Spark built-in does this, so it is the one custom Catalyst
  * `Expression` in the engine (SURVEY §4.2): a `UnaryExpression` with
  * real `doGenCode` — a static JVM call, so it stays inside
  * whole-stage codegen instead of dropping the plan out of it the way
  * the reference's Python UDF did.
  *
  * Semantics: if every char is <= 0xFF and the Latin-1 byte image is
  * strictly valid UTF-8 that decodes to a *different* string, return
  * the re-decoded string; otherwise return the input unchanged. Pure
  * ASCII and already-correct Unicode are untouched; the repair is
  * idempotent.
  */
object UnicodeSanitize {

  /** Static entry point used by both eval and generated code. */
  def repairUTF8(s: UTF8String): UTF8String = {
    val str = s.toString
    val repaired = repair(str)
    if (repaired eq str) s else UTF8String.fromString(repaired)
  }

  /** Iterate single-pass repair to a fixpoint (bounded): real scraped
    * corpora contain double-encoded mojibake ("ÃÂ©" → "Ã©" → "é"),
    * which one pass only half-fixes. */
  def repair(s: String): String = {
    var cur = s
    var i = 0
    while (i < 4) {
      val next = repairOnce(cur)
      if (next eq cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  def repairOnce(s: String): String = {
    var i = 0
    var hasHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return s // already real Unicode; not Latin-1 mojibake
      if (c > 0x7F) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII round-trips; skip the work
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    try {
      val decoder = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val decoded = decoder.decode(ByteBuffer.wrap(bytes)).toString
      if (decoded == s) s else decoded
    } catch {
      case _: CharacterCodingException => s
    }
  }

  /** Column-API entry point. */
  def unicode_sanitize(c: Column): Column =
    ColumnBridge.column(UnicodeSanitizeExpr(ColumnBridge.expression(c)))
}

case class UnicodeSanitizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any =
    UnicodeSanitize.repairUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeSanitize.repairUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeSanitizeExpr =
    copy(child = newChild)
}
