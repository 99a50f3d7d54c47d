package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dictionary.encode contract: codes are dense `[0, |distinct|)`,
  * deterministic under any partitioning (the two-phase rank orders by
  * the key itself), injective, null keys dropped — the properties the
  * an37 string→bitmap composition rests on. */
class DictionarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("codes are dense, deterministic across partitionings, and injective") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i.toLong, s"key-${i % 173}")).toDF("rid", "k")
    val runs = Seq(1, 7, 32).map { p =>
      val (coded, dict) = Dictionary.encode(df.repartition(p), "k", "code")
      val d = dict.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // dense [0, 173)
      assert(d.values.toSeq.sorted === (0L until 173L))
      // order = the key's own ordering (rank by key)
      assert(d.toSeq.sortBy(_._2).map(_._1) === d.keys.toSeq.sorted)
      // coded facts keep every non-null row, each mapped to its key's code
      val c = coded.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("code")))
      assert(c.length === 3000)
      assert(c.forall { case (k, code) => d(k) === code })
      d
    }
    assert(runs.distinct.size === 1, "partitioning changed the dictionary")
  }

  test("null keys get no dictionary row and are dropped from coded facts") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val (coded, dict) = Dictionary.encode(df, "k", "code")
    assert(dict.count() === 2L)
    assert(coded.count() === 3L)
  }

  test("composition with bitmap_distinct equals count(distinct key) on strings") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"url-${(i * 7) % 331}")).toDF("g", "k")
    val (coded, _) = Dictionary.encode(df, "k", "code")
    val viaBitmap = coded.groupBy($"g")
      .agg(graft.functions.BitmapDistinct.bitmap_distinct($"code").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy($"g").agg(countDistinct($"k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap === direct)
  }
}
