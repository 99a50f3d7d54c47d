package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proves the SCALING.md claim that pre-bucketed tables make the
  * fact/dim join shuffle-free: both sides bucketed on the join key →
  * the physical plan contains no Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitionBy layout prunes partitions at scan time") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "n_chars")
    docs.write.mode("overwrite").partitionBy("source").parquet(dir)

    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    assert(sources.length > 1, "need several partitions for the proof")
    val one = sources.sorted.head
    val q = spark.read.parquet(dir).filter(col("source") === one)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not in the data filters — only one partition's files get read
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("source"), s"source predicate not pruned:\n$scan")
    assert(q.count() === docs.filter(col("source") === one).count())
  }

  test("co-bucketed join plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables.load(spark, sf, "orders")
    val customer = graft.Tables.load(spark, sf, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join must pick sort-merge — the case
    // bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          spark.table("b_orders")("o_custkey") === spark.table("b_customer")("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // and it still returns the right rows
      val n = joined.count()
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
