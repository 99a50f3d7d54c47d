package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SrpLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated base directions + small same-direction jitters:
  // vectors sharing a direction should collide in most sign buckets
  lazy val emb = {
    val bases = Seq(
      Array.tabulate(16)(i => if (i < 6) 1.0 else -0.1),
      Array.tabulate(16)(i => if (i >= 6 && i < 11) 1.0 else 0.05),
      Array.tabulate(16)(i => if (i >= 11) -1.0 else 0.2))
    (0 until 90).map { id =>
      val b = bases(id % 3)
      // deterministic jitter, small vs the base magnitude
      (id.toLong, b.zipWithIndex.map { case (x, i) =>
        x + math.sin(id * 13 + i) * 0.01
      })
    }.toDF("vec_id", "embedding")
  }

  test("hyperplane matrix is deterministic and bounded") {
    val p1 = Similarity.hyperplanes(6, 16)
    val p2 = Similarity.hyperplanes(6, 16)
    assert(p1.map(_.toSeq).toSeq === p2.map(_.toSeq).toSeq)
    p1.flatten.foreach(k => assert(k >= -1000 && k <= 1000))
    // not degenerate: some variation within each plane
    p1.foreach(ks => assert(ks.distinct.length > 4))
  }

  test("buckets are in range and stable under repartition") {
    val planes = Similarity.hyperplanes(6, 16)
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", Similarity.srpBucket("embedding", planes).as("b"))
      .as[(Long, Long)].collect().toMap
    val a = buckets(emb.repartition(2))
    val b = buckets(emb.repartition(17))
    assert(a === b)
    a.values.foreach(v => assert(v >= 0 && v < 64))
  }

  test("same-direction vectors collide; different directions split") {
    val planes = Similarity.hyperplanes(8, 16)
    val bk = emb.select($"vec_id", Similarity.srpBucket("embedding", planes).as("b"))
      .as[(Long, Long)].collect()
    val byDir = bk.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet).toMap
    // jittered copies of one direction land in very few buckets
    byDir.values.foreach(s => assert(s.size <= 3, s"direction spread over $s"))
    // the three directions do not all share one bucket
    assert(byDir.values.flatten.toSet.size >= 3)
  }

  test("lshTopK finds a planted near-duplicate as the top neighbor") {
    val q = emb.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding")
    val out = Similarity.lshTopK(emb, q, dim = 16, nBits = 6, k = 5)
      .orderBy($"cos".desc).collect()
    assert(out.nonEmpty)
    // top hit is the vector it was copied from
    assert(out.head.getLong(1) === 0L)
    assert(out.head.getDouble(2) > 0.999)
  }

  test("multi-probe returns at most k rows per query, deterministically ranked") {
    val q = emb.filter($"vec_id" < 3)
    val out = Similarity.lshTopK(emb, q, dim = 16, nBits = 6, k = 4)
    val counts = out.groupBy("qid").count().as[(Long, Long)].collect().toMap
    counts.values.foreach(n => assert(n <= 4))
    // self never returned
    assert(out.filter($"qid" === $"vec_id").count() === 0)
  }

  // ---- JL random projection ----------------------------------------

  test("jl planes: deterministic, bounded, and a different family than SRP") {
    val p1 = Similarity.jlPlanes(8, 16)
    assert(p1.map(_.toSeq).toSeq === Similarity.jlPlanes(8, 16).map(_.toSeq).toSeq)
    p1.flatten.foreach(k => assert(k >= -1000 && k <= 1000))
    // distinct seed family: must not equal the SRP hyperplanes
    assert(p1.map(_.toSeq).toSeq !== Similarity.hyperplanes(8, 16).map(_.toSeq).toSeq)
  }

  test("jl projection is exact integer arithmetic, stable under repartition") {
    val planes = Similarity.jlPlanes(4, 16)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", Similarity.jlProject("embedding", planes).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val a = proj(emb.repartition(2))
    val b = proj(emb.repartition(17))
    assert(a === b)
    // every coordinate is an exact integer (quantized input × int plane)
    a.values.flatten.foreach(x => assert(x == math.rint(x)))
    // hand-check one coordinate on a known vector
    val v = emb.filter($"vec_id" === 0).as[(Long, Seq[Double])].head()._2
    val expected = v.zip(planes(0)).map { case (x, k) =>
      math.floor(x * 1048576.0) * k }.sum
    assert(a(0L)(0) === expected)
  }

  test("jl re-rank with k0 = corpus size equals exact top-k") {
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.cosineTopK(emb, q, k = 5)
      .as[(Long, Long, Double)].collect().toSet
    val rr = Similarity.jlRerankTopK(emb, q, dim = 16, kDim = 8,
        k0 = 90, k = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(rr === exact)
  }

  test("jl re-rank recall is at least raw-sketch recall") {
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.cosineTopK(emb, q, k = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select($"qid", $"vec_id").as[(Long, Long)].collect()
        .count(exact.contains)
    val raw = hits(Similarity.jlTopK(emb, q, dim = 16, kDim = 4, k = 5))
    val rr = hits(Similarity.jlRerankTopK(emb, q, dim = 16, kDim = 4, k0 = 20, k = 5))
    assert(rr >= raw)
    // structured corpus: the prefilter+rerank pipeline is near-exact here
    assert(rr >= (exact.size * 2) / 3, s"rerank hits $rr of ${exact.size}")
  }
}
