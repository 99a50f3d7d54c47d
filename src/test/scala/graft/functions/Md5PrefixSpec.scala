package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fused expression must be bit-identical to the builtin
  * composition it replaces — that identity is what keeps the DuckDB
  * oracles ('0x'||substr(md5(..)) casts) exact. */
class Md5PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "", "a", "hello world", "café résumé", "日本語テキスト",
    "the quick brown fox", "123456", "x" * 1000, "\ttabs\nnewlines\t")

  test("md5_prefix equals conv(substring(md5)) for 10 and 15 digits") {
    for (n <- Seq(1, 7, 10, 15)) {
      val rows = samples.toDF("s")
        .select(
          Md5Prefix.md5_prefix($"s", n).as("fused"),
          conv(substring(md5($"s"), 1, n), 16, 10).cast("long").as("builtin"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"n=$n"))
    }
  }

  test("works on real corpus words inside transform (codegen path)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .select(
        Md5Prefix.md5_prefix($"w", 10).as("fused"),
        conv(substring(md5($"w"), 1, 10), 16, 10).cast("long").as("builtin"))
      .filter($"fused" =!= $"builtin")
      .count()
    assert(diff === 0)
  }
}
