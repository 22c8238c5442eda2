package graft

import org.apache.spark.sql.SparkSession

/** One-session scaling-curve probe: run the named queries at each given
  * sf directory (median of reps) and print one JSON line per (sf, query).
  * Usage: runMain graft.ScalingProbe <sfDir1,sfDir2,...> <q1,q2,...> [reps]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDirs = args(0).split(",").toSeq
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfDir <- sfDirs; name <- names) {
      val fn = SparkEntry.queries(name)
      val times = Seq.fill(reps) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      System.gc()
      val med = times.sorted.apply(reps / 2)
      println(f"""[scaling] {"sf":"$sfDir","query":"$name","median":$med%.3f}""")
    }
    spark.stop()
  }
}
