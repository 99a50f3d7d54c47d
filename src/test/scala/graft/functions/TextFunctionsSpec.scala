package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(text: String): Long =
    Seq(text).toDF("t")
      .select(TextFunctions.qualityScore(org.apache.spark.sql.functions.col("t")))
      .collect().head.getLong(0)

  test("qualityScore stays in [0, 10000]") {
    assert(score("") >= 0)
    val perfect = ("the a of and to in is " * 40).trim // long, alpha, stopword-dense
    assert(score(perfect) > 5000 && score(perfect) <= 10000)
  }

  test("qualityScore does not overflow on multi-hundred-KB documents") {
    // length * wsTokens here is ~7.2e10 — past the point where the old
    // single-denominator rational (num * 10000 ~ 1.5e8 * d * f)
    // wrapped int64 and went negative
    val huge = ("ab " * 200000) + ("x" * 150000)
    val s = score(huge)
    assert(s >= 0 && s <= 10000, s"score $s out of range — overflow regression")
  }

  test("langId picks the stopword-densest language, und when none") {
    def lang(t: String) =
      Seq(t).toDF("t")
        .select(TextFunctions.langId(org.apache.spark.sql.functions.col("t")))
        .collect().head.getString(0)
    assert(lang("the cat of the house is in a tree") === "en")
    assert(lang("le chat et la maison des arbres") === "fr")
    assert(lang("zzz qqq 123") === "und")
  }
}
