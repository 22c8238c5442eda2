package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the seventh extension batch plus two scale
  * mechanisms: AQE skew-join splitting and the streaming foreachBatch
  * upsert sink into a graph package.
  */
class Extended7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t11 collocation ranking matches a driver-side exact recount") {
    val out = q("t11_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 20)
    // recount the top pair's frequency directly from the text
    val (w1, w2, cxy) = out.head
    val recount = Tables.t(spark, sf, "documents")
      .select(split(col("text"), " ").as("ws"))
      .select(explode(expr(
        "if(size(ws) > 1, transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS a, ws[i] AS b)), array())"))
        .as("p"))
      .filter(col("p.a") === w1 && col("p.b") === w2)
      .count()
    assert(recount == cxy)
  }

  test("t11 bigram builder survives empty and single-token documents") {
    import spark.implicits._
    // sequence(1, 0) is descending [1, 0], so an unguarded transform would
    // index out of bounds (ANSI crash) on short docs
    val out = Seq("", "solo", "two words").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(explode(expr(
        "if(size(ws) > 1, filter(transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS w1, ws[i] AS w2)), " +
          "p -> length(p.w1) > 0 AND length(p.w2) > 0), array())")).as("b"))
      .collect()
    assert(out.length == 1)
  }

  test("f14 interval battery: derived dates are self-consistent") {
    val out = q("f14_interval_battery")
    assert(out.filter(col("days_left") <= 0).isEmpty)
    val joined = out.join(Tables.t(spark, sf, "orders"), "o_orderkey")
    // plus30d really lands 30 days later
    assert(joined
      .filter(datediff(to_date(col("plus30d")), to_date(col("o_orderdate"))) =!= 30)
      .isEmpty)
    // month_end never precedes the date and shares its month
    assert(joined
      .filter(to_date(col("month_end")) < to_date(col("o_orderdate")) ||
        month(to_date(col("month_end"))) =!= month(col("o_orderdate")))
      .isEmpty)
  }

  test("AQE splits a skewed join partition when thresholds are at test scale") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // one key carries 50k rows, the rest 1 each -> that shuffle partition
      // dwarfs the advisory size and must be split
      val skewed = (1 to 50000).map(i => (0L, i.toLong)) ++
        (1 to 200).map(i => (i.toLong, i.toLong))
      val left = skewed.toDF("k", "v").repartition(8)
      val right = (0L to 200L).map(k => (k, s"dim$k")).toDF("k", "name")
        .repartition(8)
      // no aggregation downstream: OptimizeSkewedJoin declines to split when
      // the join output must be re-distributed for a parent operator
      val j = left.join(right, "k").select("v", "name")
      assert(j.count() == 50200L)
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in:\n${plan.take(3000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("streaming foreachBatch upserts into a graph package with last-wins semantics") {
    import graft.graph.PropertyGraph
    import graft.store.GraphPackage
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    // the package must live OUTSIDE the streaming source dir (the file
    // source globs the whole tree)
    val pkg = java.nio.file.Files.createTempDirectory("graft-sink-pkg")
      .resolve("pkg").toString

    // seed package from the micro fixture
    val g0 = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path),
      graft.ingest.GeoJsonIngest.Options())
    GraphPackage.save(g0, pkg)

    // stream events in; each micro-batch becomes an edge upsert keyed on
    // (_u,_v) — u/v derived from user/event ids so keys repeat across rows
    val stream = graft.streaming.EventStream.readEvents(spark, dir.toString)
    val q = stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
      val updates = batch
        .select(concat(lit("u"), col("user_id") % 10).as("_u"),
          concat(lit("v"), col("user_id") % 7).as("_v"),
          col("value").as("weight"))
      val g = GraphPackage.load(spark, pkg)
      GraphPackage.save(g.addEdges(updates), pkg)
    }.start()
    try q.processAllAvailable() finally q.stop()

    val after = GraphPackage.load(spark, pkg)
    // all fixture edges survive, streamed keys are deduped last-wins
    assert(after.size() == g0.size() +
      spark.read.parquet(dir.resolve("events.parquet").toString)
        .select((col("user_id") % 10).as("a"), (col("user_id") % 7).as("b"))
        .distinct().count())
    // upsert is keyed: re-running the same batch adds nothing
    val again = GraphPackage.load(spark, pkg)
    val updates = Tables.events(spark, "/root/testdata/sf0.001")
      .select(concat(lit("u"), col("user_id") % 10).as("_u"),
        concat(lit("v"), col("user_id") % 7).as("_v"),
        col("value").as("weight"))
    GraphPackage.save(again.addEdges(updates), pkg)
    assert(GraphPackage.load(spark, pkg).size() == after.size())
  }
}
