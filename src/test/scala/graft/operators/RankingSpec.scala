package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Two-phase distributed ranking: equality with the single-partition
  * window forms it replaces, stability under input layout, and the
  * SQL ntile split on uneven bucket sizes. */
class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 997).map(i => ((i * 7919) % 1000, i))
    .toDF("k", "id") // k collides, (k, id) is total

  test("globalRowNumber equals the single-partition window rank") {
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy($"k", $"id")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val got = Ranking.globalRowNumber(df, Seq($"k", $"id"), "rn")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2).toInt)).toSet
    assert(got === want)
  }

  test("globalRowNumber is layout-independent") {
    def ranks(d: org.apache.spark.sql.DataFrame) =
      Ranking.globalRowNumber(d, Seq($"k", $"id"), "rn")
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(ranks(df) === ranks(df.repartition(13)))
    assert(ranks(df) === ranks(df.coalesce(1)))
  }

  test("globalNtile matches ntile() exactly, including the uneven split") {
    // 997 rows into 4 tiles: sizes 250, 249, 249, 249
    val want = df.withColumn("q", ntile(4).over(Window.orderBy($"k", $"id")))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val got = Ranking.globalNtile(df, Seq($"k", $"id"), 4, "q")
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(got === want)
    val sizes = Ranking.globalNtile(df, Seq($"k", $"id"), 4, "q")
      .groupBy($"q").count().orderBy($"q").collect().map(_.getLong(1)).toSeq
    assert(sizes === Seq(250L, 249L, 249L, 249L))
  }

  test("globalNtile with more buckets than rows mirrors ntile()") {
    val tiny = Seq(5, 1, 3).toDF("id")
    val want = tiny.withColumn("q", ntile(7).over(Window.orderBy($"id")))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val got = Ranking.globalNtile(tiny, Seq($"id"), 7, "q")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === want)
  }

  test("empty input yields empty output") {
    assert(Ranking.globalRowNumber(df.filter(lit(false)), Seq($"id"), "rn")
      .count() === 0L)
    assert(Ranking.globalNtile(df.filter(lit(false)), Seq($"id"), 4, "q")
      .count() === 0L)
  }

  test("no single-partition window over the data in the plan") {
    // the only Window.orderBy with no partition key runs over the
    // per-partition counts relation (≤ numShufflePartitions rows);
    // the data-sized window is partitioned by __pid
    val plan = Ranking.globalRowNumber(df, Seq($"k", $"id"), "rn")
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    // every data-side window spec must carry a partition expression
    val dataWindows = windows.filterNot(_.contains("__c"))
    assert(dataWindows.forall(_.contains("__pid")),
      s"found an unpartitioned data window:\n$plan")
  }
}
