package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** The native expression must be bit-identical to the declarative
  * higher-order formulation it replaces (aggregate over zip_with) —
  * including fold order and the null contract — because the similarity
  * oracles hash scores derived from it. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot equals HOF dot bit-for-bit on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    // self-pairs and shifted pairs (different vectors per pair)
    val pairs = emb.as("a").join(
      emb.select(($"vec_id" + 1).as("vec_id"), $"v".as("w")).as("b"), Seq("vec_id"))
    val diff = pairs.select(
        Similarity.dot($"v", $"w").as("native"),
        Similarity.dotHof($"v", $"w").as("hof"))
      // string-repr compare: Spark's shortest-round-trip rendering
      // distinguishes every distinct double incl. -0.0 vs 0.0 and
      // renders NaN as "NaN" (payload bits are NOT covered — fine
      // here, arithmetic never produces payloaded NaNs from real
      // embeddings)
      .filter(expr("not (cast(native as string) <=> cast(hof as string))"))
      .count()
    assert(diff === 0)
  }

  test("null contract matches zip_with padding semantics") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),          // plain
      (Seq.empty[Double], Seq.empty[Double]),  // empty -> 0.0
      (Seq(1.0, 2.0), Seq(3.0)),               // length mismatch -> null
      (Seq(1.0), Seq(2.0, 5.0))                // other direction -> null
    ).toDF("a", "b")
    val rows = df.select(
        Similarity.dot($"a", $"b").as("native"),
        Similarity.dotHof($"a", $"b").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("null ELEMENTS yield null like the HOF form") {
    val df = spark.sql(
      "SELECT array(1.0d, cast(null as double)) AS a, array(2.0d, 3.0d) AS b")
    val r = df.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL-registered dot_product works") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }
}
