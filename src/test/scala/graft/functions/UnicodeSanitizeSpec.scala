package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.UnicodeSanitize.{repair, unicode_sanitize}

class UnicodeSanitizeSpec extends AnyFunSuite {

  def mojibake(s: String): String =
    new String(s.getBytes("UTF-8").map(b => (b & 0xff).toChar))

  test("repairs classic latin1-as-utf8 mojibake") {
    assert(repair("cafÃ©") === "café")
    assert(repair("rÃ©sumÃ©") === "résumé")
    assert(repair(mojibake("über naïve")) === "über naïve")
  }

  test("repairs double-encoded mojibake to a fixpoint (seen in the real corpus)") {
    assert(repair(mojibake(mojibake("café"))) === "café")
    assert(repair(mojibake(mojibake(mojibake("Supérieure de Fès")))) === "Supérieure de Fès")
  }

  test("leaves clean text untouched") {
    assert(repair("plain ascii") === "plain ascii")
    assert(repair("café") === "café") // a lone é is not a valid UTF-8 byte image
    assert(repair("") === "")
    assert(repair("中文 stays") === "中文 stays") // >0xFF chars: not a latin1 image
  }

  test("inverts corruption and is idempotent (randomized property)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc XYZ09éàüñç€—“”"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = repair(mojibake(s))
      assert(once === s, s"failed for ${s.map(_.toInt)}")
      assert(repair(once) === once)
    }
  }

  test("works as a codegen'd Column expression") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Seq("cafÃ©", "ok").toDF("s")
      .select(unicode_sanitize($"s").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("café", "ok"))
  }
}
