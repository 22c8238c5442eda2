package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupTopK

/** The custom per-group top-k plan must (a) match the window-function
  * formulation row-for-row, (b) plan as partial→exchange→final with a
  * single shuffle, (c) bound the exchange to k rows per group per map
  * partition.
  */
class GroupTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("topK equals window row_number formulation (unique tiebreak)") {
    val li = Tables.t(spark, sf, "lineitem")
    val got = GroupTopK.topK(li, Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect()
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    // keep rn in the projection so RankLimitRewrite (installed on the
    // shared session by other suites) cannot rewrite the baseline into the
    // very operator under test; drop it after collect
    val want = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), r.get(3)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("plan shape: partial and final exec around exactly one exchange") {
    val li = Tables.t(spark, sf, "lineitem")
    val df = GroupTopK.topK(li, Seq("l_returnflag"), Seq(("l_extendedprice", false)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(plan).length == 2, s"want partial+final:\n$plan")
    val nExchanges = "(?i)exchange".r.findAllIn(plan).length
    assert(nExchanges >= 1, s"expected a hash exchange between phases:\n$plan")
    // final output is at most groups × k rows
    assert(df.count() == 3 * li.select("l_returnflag").distinct().count())
  }

  test("map-side partial bounds pre-shuffle rows to groups × k per partition") {
    import spark.implicits._
    // 4 partitions × 2 groups × k=2 → partial emits ≤ 16 rows for 100k input
    val df = spark.range(100000).repartition(4)
      .select((col("id") % 2).as("g"), col("id").as("v"))
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", true)), 2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (0L, 2L), (1L, 1L), (1L, 3L)))
  }

  test("empty group list = global top-k (AllTuples final phase)") {
    import spark.implicits._
    val df = spark.range(10000).select(col("id").as("v"))
    val got = GroupTopK.topK(df, Seq.empty, Seq(("v", false)), 5)
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(9995L, 9996L, 9997L, 9998L, 9999L))
  }

  test("g9_knn_classify plans through GroupTopK with no window sort") {
    val df = SparkEntry.queries("g9_knn_classify")(spark, sf)
    df.collect() // finalize AQE so the asserted plan is the executed one
    // AQE's toString prints the final plan then the initial plan — assert
    // on the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("GroupTopK \\[".r.findAllIn(plan).length == 2,
      s"top-5 should be partial+final GroupTopK, not a window sort:\n$plan")
    assert(!plan.contains("Window"),
      s"g9 must not pay a per-group full sort (top-5) nor a vote window:\n$plan")
  }

  test("k larger than any group returns every row") {
    val li = Tables.t(spark, sf, "lineitem").limit(200)
    val got = GroupTopK.topK(li, Seq("l_orderkey"), Seq(("l_linenumber", true)), 1000)
    assert(got.count() == 200)
  }
}
