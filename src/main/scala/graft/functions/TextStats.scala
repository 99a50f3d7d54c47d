package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass replacement for the regex formulas behind langId /
  * qualityScore: per-language stopword hits, ASCII-alpha count,
  * char length, and whitespace token count — computed in two byte
  * scans (original + lowered) instead of five `regexp_extract_all` /
  * `regexp_replace` / `split` passes per document.
  *
  * VALUE-IDENTICAL to the ASCII-boundary regex formulas (spec-enforced
  * by TextStatsSpec's equivalence property + every t1/t2/c1 oracle).
  * Boundary semantics, carefully: Java's `\b` is Unicode-aware
  * (isLetterOrDigit — "the中文" is one word run) but DuckDB's RE2 `\b`
  * is ASCII; the ORACLE's ASCII semantics are the engine contract, so
  * this scan — and the lookaround-based Spark regex reference — both
  * implement ASCII boundaries. The reductions:
  *  - ASCII-bounded `(w1|w2|..)` over `lower(text)` counts exactly the
  *    maximal [A-Za-z0-9_] runs equal to a listed word (a partial-run
  *    match always fails the trailing/leading boundary);
  *  - `size(split(trim(text), "\s+"))` with Spark's limit=-1 split
  *    and space-only (0x20) trim equals (#maximal ASCII-\s runs in
  *    the space-trimmed string) + 1, empties included;
  *  - `length(regexp_replace(text, "[^A-Za-z]", ""))` is the ASCII
  *    letter count; `length(text)` is numChars.
  * Byte scanning is sound because every class involved is
  * single-byte ASCII; any byte >= 0x80 belongs to a multi-byte char
  * and is correctly non-word/non-space/non-alpha.
  */
object TextStats {

  val Langs: Seq[String] = Seq("en", "fr", "de", "es")

  private val stopwords: Array[Array[Array[Byte]]] = Array(
    Array("the", "a", "of", "and", "to", "in", "is"),
    Array("le", "la", "les", "et", "des", "un", "une"),
    Array("der", "die", "das", "und", "ein", "nicht"),
    Array("el", "los", "las", "y", "un", "una", "que")
  ).map(_.map(_.getBytes("US-ASCII")))

  val schema: StructType = StructType(
    Langs.map(l => StructField(l, IntegerType, nullable = false)) ++ Seq(
      StructField("alpha", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("ws", IntegerType, nullable = false)))

  @inline private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  @inline private def isSpaceByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  @inline private def isAlphaByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def runMatches(bytes: Array[Byte], start: Int, end: Int,
      word: Array[Byte]): Boolean = {
    if (end - start != word.length) return false
    var i = 0
    while (i < word.length) {
      if (bytes(start + i) != word(i)) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String): InternalRow = {
    val orig = s.getBytes
    // ---- pass 1 (original bytes): alpha, whitespace tokens ----------
    var alpha = 0
    var i = 0
    while (i < orig.length) {
      if (isAlphaByte(orig(i))) alpha += 1
      i += 1
    }
    // space-only trim bounds (Spark's trim removes 0x20 exclusively)
    var lo = 0
    while (lo < orig.length && orig(lo) == ' ') lo += 1
    var hi = orig.length
    while (hi > lo && orig(hi - 1) == ' ') hi -= 1
    // tokens = (#maximal \s runs) + 1 on the trimmed region
    var wsRuns = 0
    var inRun = false
    i = lo
    while (i < hi) {
      val sp = isSpaceByte(orig(i))
      if (sp && !inRun) { wsRuns += 1; inRun = true }
      else if (!sp) inRun = false
      i += 1
    }
    val ws = wsRuns + 1
    // ---- pass 2 (lowered bytes): stopword hits per language ---------
    val lower = s.toLowerCase.getBytes
    val hits = new Array[Int](Langs.size)
    i = 0
    while (i < lower.length) {
      if (isWordByte(lower(i))) {
        val start = i
        while (i < lower.length && isWordByte(lower(i))) i += 1
        var l = 0
        while (l < stopwords.length) {
          val words = stopwords(l)
          var w = 0
          var matched = false
          while (!matched && w < words.length) {
            matched = runMatches(lower, start, i, words(w))
            w += 1
          }
          if (matched) hits(l) += 1
          l += 1
        }
      } else i += 1
    }
    InternalRow(hits(0), hits(1), hits(2), hits(3), alpha, s.numChars(), ws)
  }

  def text_stats(c: Column): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(c)))
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
