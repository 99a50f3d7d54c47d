package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Sweeps EVERY registered query's physical plan for the shapes that
  * die at 100 TB: Exchange SinglePartition (one-task funnels),
  * CartesianProduct, and BroadcastNestedLoopJoin. Prints one line per
  * offender; PlanShapeSpec pins the allowlist.
  */
object PlanAudit {
  val suspects = Seq("Exchange SinglePartition", "CartesianProduct",
    "BroadcastNestedLoopJoin")

  /** Constructing e4 EXECUTES a real streaming query and its returned
    * plan is the memory-sink read, not the streaming topology — an
    * always-green audit row that costs a full stream run. PlanShapeSpec
    * shares this exclusion; the set itself is the canonical
    * [[graft.streaming.Streams.realStreamingGateQueries]] (also
    * consumed by Bench's streaming split). */
  val excluded: Set[String] =
    graft.streaming.Streams.realStreamingGateQueries

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => excluded.contains(name) }
      .foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
        val hits = suspects.filter(plan.contains)
        if (hits.nonEmpty) println(s"[audit] $name: ${hits.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getClass.getSimpleName}")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
