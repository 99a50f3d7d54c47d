package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Algorithm-level checks for the chunk/pack/split stages that have no
  * standalone operator spec (their oracle queries are the primary
  * gate; these pin the properties the oracle can't see).
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t18 epoch shuffle is a true permutation: dense positions, balanced shards, seed-stable") {
    import spark.implicits._
    val shuffled = TextPipeline.t18EpochShuffle(spark, sf).cache()
    val n = shuffled.count()
    // positions are exactly 1..n (a permutation, not a sample or a
    // collision casualty)
    assert(shuffled.agg(min($"pos"), max($"pos"), countDistinct($"pos"))
      .as[(Long, Long, Long)].head() === ((1L, n, n)))
    // round-robin shards differ in size by at most one
    val sizes = shuffled.groupBy($"shard").count()
      .select($"count").as[Long].collect()
    assert(sizes.length === 8 && sizes.max - sizes.min <= 1)
    // the permutation is layout-independent: same rows under any
    // partitioning of the input (determinism is the whole point)
    val again = TextPipeline.t18EpochShuffle(spark, sf)
    assert(shuffled.exceptAll(again).count() === 0L)
    assert(again.exceptAll(shuffled).count() === 0L)
    // and it is NOT the identity ordering — the hash actually permutes
    assert(shuffled.filter($"pos" =!= $"doc_id" + 1L).count() > 0L)
    shuffled.unpersist()
  }

  test("t7 two-phase distributed cumsum equals the single-task global window") {
    import spark.implicits._
    val distributed = TextPipeline.t7Packing(spark, sf)
    val chunks = TextPipeline.t6Chunking(spark, sf)
      .select($"doc_id", $"chunk_no", $"n_tokens")
    val naive = chunks
      .withColumn("cum", sum($"n_tokens").over(
        Window.orderBy($"doc_id", $"chunk_no")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"chunk_no", expr("(cum - 1) div 512").as("pack_id"))
    assert(distributed.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(distributed).count() === 0L)
  }

  test("t7 pack ids are dense, start at zero, and never exceed the token budget order") {
    import spark.implicits._
    val packs = TextPipeline.t7Packing(spark, sf)
      .join(TextPipeline.t6Chunking(spark, sf).select($"doc_id", $"chunk_no", $"n_tokens"),
        Seq("doc_id", "chunk_no"))
      .groupBy($"pack_id").agg(sum($"n_tokens").as("tok"))
    val rows = packs.orderBy($"pack_id").collect()
    assert(rows.head.getLong(0) === 0L)
    // dense ids: max pack_id == n_packs - 1
    assert(rows.last.getLong(0) === rows.length - 1L)
    // every pack except possibly the last stays within budget + one
    // overflowing chunk (sequential packing semantics: a chunk joins
    // the pack its cumulative START falls into, so a pack can exceed
    // 512 by at most one chunk's tokens - 1; chunks are <= 50 tokens)
    rows.init.foreach(r => assert(r.getLong(1) <= 512L + 49L,
      s"pack ${r.getLong(0)} holds ${r.getLong(1)} tokens"))
  }

  test("t6 chunk boundaries: full coverage with 10-token overlap") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_words"))
    val agg = TextPipeline.t6Chunking(spark, sf)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"), sum($"n_tokens").as("tok"))
      .join(docs, "doc_id")
    // every word is covered: sum of chunk sizes = words + 10 overlap
    // per chunk after the first
    val bad = agg.filter($"tok" =!= $"n_words" + ($"n_chunks" - 1) * 10).count()
    assert(bad === 0L)
  }

  test("t5 split is an exact 80/10/10 hash partition (no doc in two splits)") {
    import spark.implicits._
    val s = TextPipeline.t5SplitAssign(spark, sf)
    assert(s.select($"doc_id").distinct().count() === s.count())
    val frac = s.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = frac.values.sum.toDouble
    assert(frac("train") / n > 0.7 && frac("train") / n < 0.9)
    assert(frac("val") / n > 0.05 && frac("val") / n < 0.15)
    assert(frac("test") / n > 0.05 && frac("test") / n < 0.15)
  }

  test("d14: prefix/suffix blocking loses no lev<=1 pair (vs brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = (0 until 120).map(_ =>
      (0 until (4 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    // replicate the d14 candidate blocking + verify inline on this vocab
    val vocab = words.toDF("w")
    val keys = vocab.selectExpr("w",
      """explode(array(
        |  concat('p:', substring(w, 1, 2), ':', CAST(length(w) AS STRING)),
        |  concat('p:', substring(w, 1, 2), ':', CAST(length(w) + 1 AS STRING)),
        |  concat('s:', substring(w, -2, 2), ':', CAST(length(w) AS STRING)),
        |  concat('s:', substring(w, -2, 2), ':', CAST(length(w) + 1 AS STRING)))) AS k""".stripMargin)
    import org.apache.spark.sql.functions.levenshtein
    val blocked = keys.as("a").join(keys.as("b"), $"a.k" === $"b.k" && $"a.w" < $"b.w")
      .select($"a.w", $"b.w").distinct()
      .filter(levenshtein($"a.w", $"b.w") <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty) // the alphabet-3 vocab must actually produce pairs
  }

  test("t26: no near-dup cluster straddles splits") {
    import spark.implicits._
    val out = TextPipeline.t26LeakageSafeSplit(spark, sf)
      .select($"split_key", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // every doc sharing a split_key (= cluster) has the same split
    out.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"cluster $k straddles splits")
    }
    // the injected near-dups (doc_id % 97 == 0 ↔ +1000000) really do
    // share a key with their original — the property t5 lacks
    val keys = TextPipeline.t26LeakageSafeSplit(spark, sf)
      .select($"doc_id", $"split_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val paired = keys.keys.filter(id => id < 1000000 && keys.contains(id + 1000000))
    assert(paired.nonEmpty)
    paired.foreach(id => assert(keys(id) === keys(id + 1000000)))
  }

  test("c3 funnel stages partition every source's documents; survivors = c1") {
    import spark.implicits._
    val f = TextPipeline.c3CurationFunnel(spark, sf).collect()
    f.foreach { r =>
      // lang_fail + quality_fail + dup + survivors == total, per source
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) === r.getLong(1))
    }
    // the funnel's survivor count must agree with the c1 filter itself
    assert(f.map(_.getLong(5)).sum === TextPipeline.c1Curate(spark, sf).count())
  }
}
