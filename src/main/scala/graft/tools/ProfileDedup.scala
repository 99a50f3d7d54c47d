package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Stage-level profiler for the dedup path (VERDICT r2 watch item:
  * where do d2's seconds go — signature agg, candidate self-join, or
  * verify?). Times each cumulative subplan with N reps and prints the
  * median delta per stage. Findings are recorded in SCALING.md §d2.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Tables.load(spark, sfDir, "documents")
    val docs = d.select(col("doc_id"), col("text"), col("source"))
      .unionByName(
        d.filter(col("doc_id") % 97 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" near dup tail")).as("text"), col("source")))

    def base = Dedup.shingleBaseHashes(docs, "doc_id", "text")
    def stages: Seq[(String, () => DataFrame)] = Seq(
      "1_shingle_hashes" -> (() => base),
      "2_signatures" -> (() => Dedup.lshBuckets(base)),
      "3_candidates" -> (() => Dedup.candidatePairs(Dedup.lshBuckets(base))),
      "4_full_d2" -> (() => Dedup.minhashNearDups(docs, "doc_id", "text")))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    docs.count() // warm-up
    var prev = 0.0
    stages.foreach { case (name, mk) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      val m = med(times)
      println(f"[profile] $name%-18s cum=$m%7.3f s  delta=${m - prev}%7.3f s")
      prev = m
    }

    // d6: connected components over the d2 pairs — how much of its
    // bench time is the pair plan vs the label-propagation rounds?
    // dupClusters checkpoints its input, so timing it on an ALREADY
    // materialized pair frame isolates the propagation cost (the
    // second checkpoint just copies in-memory rows).
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
    val t0 = System.nanoTime()
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    val mat = pairs.localCheckpoint()
    val t1 = System.nanoTime()
    Dedup.dupClusters(mat).count()
    val tCc = (System.nanoTime() - t1) / 1e9
    println(f"[profile] d6: pairs($nPairs)=$tPairs%.3f s, propagation-only=$tCc%.3f s")
    spark.stop()
  }
}
