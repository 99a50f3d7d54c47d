package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fused byte-scan TextStats must be VALUE-identical to the regex
  * formulations it replaced — over adversarial generated strings
  * (word-boundary digits/underscores, tabs/CR/vertical-tab whitespace,
  * leading/trailing spaces, multi-byte unicode, empties) and over the
  * sf0.001 documents. Any divergence is an oracle break waiting to
  * happen, so this property IS the safety net for the optimization.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(1337L)).get

  private def assertEquivalent(strings: Seq[String]): Unit = {
    val df = strings.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id",
        TextFunctions.langId($"text").as("fast_lang"),
        TextFunctions.langIdRegex($"text").as("slow_lang"),
        TextFunctions.qualityScore($"text").as("fast_q"),
        TextFunctions.qualityScoreRegex($"text").as("slow_q"))
    val diff = df.filter($"fast_lang" =!= $"slow_lang" || $"fast_q" =!= $"slow_q")
      .collect()
    assert(diff.isEmpty,
      s"fused/regex divergence:\n${diff.take(5).mkString("\n")}")
  }

  test("fused stats == regex formulas on adversarial generated strings") {
    val word = Gen.oneOf("the", "a", "of", "und", "un", "una", "que", "THE",
      "the2", "the_", "_the", "thethe", "café", "naïve", "中文", "x")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", ".", ", ", "",
      "\f", "-", "'", " \t ")
    val sentence = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n + 1, sep)
    } yield ss.zip(ws :+ "").map { case (s, w) => s + w }.mkString
    val strings = samples(Gen.listOfN(400, sentence)) ++
      Seq("", " ", "   ", "\t", "the", " the ", "\tthe\t", "a.a.a",
        "un le el the", "le le le", "¿qué? ¡una!", "café né the",
        // stopwords ADJACENT to non-ASCII letters: where Java's
        // unicode \b diverged from the oracle's ASCII \b (r3 review);
        // the engine contract is ASCII — these must count as hits
        "the中文", "中文the", "día", "caféa", "athé", "aé a é中the")
    assertEquivalent(strings.distinct)
  }

  test("fused stats == regex formulas on the documents table") {
    val texts = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    assertEquivalent(texts)
  }
}
