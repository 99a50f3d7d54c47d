package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HLL contract: percent-level accuracy, exact determinism across
  * partitionings and merge orders (max-merge ⇒ the registers are a
  * pure function of the key set), string/integral key support, and
  * analysis-time type failure. */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("estimate within 3% at 100k random 64-bit keys; deterministic across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val keys = Seq.fill(120000)(rnd.nextLong()).distinct.take(100000)
    val df = keys.toDF("k")
    val ests = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(Hll.hll_distinct($"k")).head().getLong(0)
    }
    // max-merge order-independence: every partitioning the SAME estimate
    assert(ests.distinct.size === 1, s"partitioning changed the estimate: $ests")
    val err = math.abs(ests.head.toDouble / keys.size - 1.0)
    assert(err < 0.03, s"estimate ${ests.head} off by ${err * 100}% at n=${keys.size}")
  }

  test("small cardinalities are near-exact (linear-counting range)") {
    import spark.implicits._
    val df = (1L to 500L).flatMap(i => Seq(i, i)).toDF("k") // heavy dups
    val est = df.agg(Hll.hll_distinct($"k")).head().getLong(0)
    // linear-counting variance at n=500, m=4096 is ~sqrt(n^2/2m) ~ 5.5;
    // a 2% band is ~3.6 sigma on a DETERMINISTIC hash (no flake risk)
    assert(math.abs(est - 500L) <= 10, s"est $est at n=500")
  }

  test("INIT -> MERGE roll-up equals the one-shot estimate exactly (same register set)") {
    import spark.implicits._
    val df = (1L to 30000L).map(i => (s"g${i % 4}", s"url-${i % 7013}")).toDF("g", "k")
    val oneShot = df.agg(Hll.hll_distinct($"k")).head().getLong(0)
    val rolled = df.groupBy($"g").agg(Hll.hll_sketch($"k").as("sk"))
      .agg(Hll.hll_merge_count($"sk")).head().getLong(0)
    // not approximately: register-wise max over any grouping yields the
    // IDENTICAL registers, hence the identical estimate
    assert(rolled === oneShot)
    val exact = 7013.0
    assert(math.abs(rolled / exact - 1.0) < 0.05, s"rolled $rolled vs exact $exact")
  }

  test("string keys hash stably; null keys ignored; type check fails at analysis") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), Some("a"), None).toDF("k")
    val est = df.agg(Hll.hll_distinct($"k")).head().getLong(0)
    assert(est === 2L)
    val e = intercept[Exception] {
      Seq(1.5).toDF("k").agg(Hll.hll_sketch($"k")).queryExecution.analyzed
    }
    assert(e.getMessage.toLowerCase.contains("integral") ||
      e.getMessage.contains("hll_sketch"))
    val e2 = intercept[Exception] {
      Seq(1L).toDF("sk").agg(Hll.hll_merge_count($"sk")).queryExecution.analyzed
    }
    assert(e2.getMessage.toLowerCase.contains("binary") ||
      e2.getMessage.contains("hll_merge_count"))
  }

  test("merging a foreign blob fails loudly, not garbage-in") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk").agg(Hll.hll_merge_count($"sk")).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("bad magic") || m.contains("register width")))
  }

  // ---- sparse serialized form (r11) ------------------------------------

  test("serialization is canonical across the sparse/dense promotion boundary") {
    // representation is a deterministic rule on the register SET:
    // occupied < M/8 -> sorted (idx, rank) list, >= M/8 -> raw registers
    def regsWith(occupied: Int): Array[Byte] = {
      val r = new Array[Byte](Hll.M)
      (0 until occupied).foreach(i => r(i * 7 % Hll.M) = ((i % 50) + 1).toByte)
      r
    }
    val atBoundary = regsWith(Hll.SparseMax) // 512 occupied -> dense
    val below = regsWith(Hll.SparseMax - 1)  // 511 occupied -> sparse
    val denseBytes = Hll.serialize(atBoundary)
    val sparseBytes = Hll.serialize(below)
    assert(denseBytes.length === Hll.M, "boundary set must serialize dense")
    assert(sparseBytes.length === 6 + 3 * (Hll.SparseMax - 1))
    // both round-trip to the exact register set
    assert(java.util.Arrays.equals(Hll.toDense(denseBytes), atBoundary))
    assert(java.util.Arrays.equals(Hll.toDense(sparseBytes), below))
    // re-serializing a round-tripped sketch is byte-stable
    assert(java.util.Arrays.equals(Hll.serialize(Hll.toDense(sparseBytes)), sparseBytes))
  }

  test("sparse sketch bytes are identical across partitionings and merge orders") {
    import spark.implicits._
    val df = (1L to 300L).map(i => s"url-$i").toDF("k") // ~290 occupied: sparse
    val runs = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(Hll.hll_sketch($"k")).head().getAs[Array[Byte]](0)
    }
    assert(runs.head.length < Hll.M, "300 keys should serialize sparse (~10x smaller)")
    assert(runs.forall(java.util.Arrays.equals(_, runs.head)),
      "partitioning changed the sketch bytes")
    // sparse and dense generations merge together: the near-empty grain
    // rolls up with a dense one and the estimate matches the one-shot
    val big = (1L to 20000L).map(i => s"url-$i").toDF("k")
    val mixed = df.agg(Hll.hll_sketch($"k").as("sk"))
      .unionByName(big.agg(Hll.hll_sketch($"k").as("sk")))
    val rolled = mixed.agg(Hll.hll_merge_count($"sk")).head().getLong(0)
    val oneShot = big.agg(Hll.hll_distinct($"k")).head().getLong(0)
    assert(rolled === oneShot) // 1..300 is a subset of 1..20000
  }
}
