package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for a named list of queries, one file per
  * query — the before/after plan evidence for optimization rounds
  * (plans/rNN/<query>_<tag>.txt). Unlike ExplainDump (the fixed headline
  * EXPLAINS.md), this takes the query list and output names on the command
  * line so the same binary can snapshot any slice of the registry:
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val tag = args(2)
    val names = args(3).split(',').map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the printed plan is the executed one
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .replaceAll("0x[0-9A-Fa-f]{257,}", "0x…<large binary literal elided>")
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
