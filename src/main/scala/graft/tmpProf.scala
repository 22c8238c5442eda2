package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpProf {
  def main(args: Array[String]): Unit = {
    val nPts = args(0).toLong
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("TMPPARTS", "32"))
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val eps = 500L
    val perCell = 8.0
    val wCells = math.max(1L, math.ceil(math.sqrt(nPts / perCell)).toLong)
    val w = wCells * eps
    val pts = s.range(nPts).select(col("id").as("pid"),
      pmod(xxhash64(col("id"), lit(1)), lit(w)).as("xc"),
      pmod(xxhash64(col("id"), lit(2)), lit(w)).as("yc"))
    val p = pts.select(col("pid"), col("xc").cast("long").as("xc"), col("yc").cast("long").as("yc"))
      .withColumn("cx", expr(s"xc div $eps")).withColumn("cy", expr(s"yc div $eps"))
    time("histogram guard") { graft.spatial.Spatial.ringCandidateCount(p, "xc", "yc", eps) }
    val ring = p.select(col("pid").as("ai"), col("xc").as("ax"), col("yc").as("ay"),
        explode(expr("transform(sequence(0, 8), i -> struct(cx + i div 3 - 1 AS rx, cy + i % 3 - 1 AS ry))")).as("r"))
      .select(col("ai"), col("ax"), col("ay"), col("r.rx").as("cx"), col("r.ry").as("cy"))
    val nbr0 = ring.join(p.select(col("pid").as("bi"), col("xc").as("bx"), col("yc").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("ax")-col("bx"))*(col("ax")-col("bx")) + (col("ay")-col("by"))*(col("ay")-col("by")) <= lit(eps*eps))
      .select("ai", "bi")
    val nbr = time("ring join + localCheckpoint") { nbr0.localCheckpoint() }
    System.err.println(s"[prof] nbr partitions=${nbr.rdd.getNumPartitions}")
    time("nbr count") { System.err.println("[prof] nbr rows=" + nbr.count()) }
    val core = time("core agg + checkpoint") {
      nbr.groupBy("ai").agg(count(lit(1)).as("n")).filter(col("n") >= 4L).select(col("ai")).localCheckpoint() }
    time("border") {
      nbr.join(core.withColumnRenamed("ai", "bi"), Seq("bi"), "left_semi")
        .select("ai").distinct().join(core, Seq("ai"), "left_anti").count() }
    s.stop()
  }
}
