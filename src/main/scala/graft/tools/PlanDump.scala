package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dumps the formatted physical plan of NAMED queries to per-query
  * files — the optimization-round evidence trail (`plans/r13/`): one
  * `<query>_<tag>.txt` per query so a before/after plan diff can be
  * reviewed without running Spark. Same session shape as
  * [[Explain]]; same real-streaming exclusion (those execute on
  * construction and return a memory-sink read, not the topology).
  *
  *   runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.drop(3).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val f = outDir.resolve(s"${name}_$tag.txt")
      Files.write(f, plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
