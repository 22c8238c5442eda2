package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: time one named query on a warm session.
  * `runMain graft.BenchOne <sfDir> <query> [reps]` — prints per-rep seconds,
  * so steady-state cost separates from first-job session warm-up.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one throwaway job so session/codegen warm-up is not billed to rep 0
    spark.range(1000).selectExpr("sum(id)").collect()
    // comma-separated names replay a slice of the sweep in ONE session,
    // with the sweep's own inter-query hygiene — the probe for "query A
    // poisons query B" interactions that per-query runs can't see
    name.split(',').map(_.trim).filter(_.nonEmpty).foreach { q =>
      val fn = SparkEntry.queries(q)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      System.gc()
      println(s"""[benchone] {"query":"$q","reps":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
