package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The rank-limit rewrite must turn window top-k filters into GroupTopK
  * exactly when safe: rank projected away, single row_number expression.
  */
class RankLimitRewriteSpec extends AnyFunSuite {
  lazy val spark = { val s = TestSpark.spark; GraftExtensions.registerAll(s); s }
  val sf = "/root/testdata/sf0.001"

  private def windowTopK(k: Int) = {
    val li = Tables.t(spark, sf, "lineitem")
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("rewrite fires: physical plan uses GroupTopK, no Window") {
    val df = windowTopK(3)
    val plan = df.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(plan).length == 2, s"no rewrite:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ["), plan)
  }

  test("rewritten result equals the un-rewritten window result") {
    val got = windowTopK(4)
      .select("l_returnflag", "l_orderkey", "l_linenumber")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber").collect()

    // same query with the rule suppressed: keep rn in the output (blocks
    // the rewrite), then drop it afterwards via a second collect-side map
    val li = Tables.t(spark, sf, "lineitem")
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val want = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "rn")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty && got.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sameElements(want))
  }

  test("global top-k (no PARTITION BY) rewrites and still runs") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
    val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("l_orderkey", "l_linenumber")
    val plan = df.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(plan).length == 2, s"no rewrite:\n$plan")
    // equals the plain global orderBy-limit
    val want = li.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(7).select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSet
    assert(df.as[(Long, Int)].collect().toSet == want)
  }

  test("no rewrite when the rank column is observed") {
    val df = windowTopK(3)
    val li = Tables.t(spark, sf, "lineitem")
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val keepsRank = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "rn")
    val plan = keepsRank.queryExecution.executedPlan.toString
    assert(!plan.contains("GroupTopK"), s"must not rewrite when rn observed:\n$plan")
    // and the rank values are still correct
    val ranks = keepsRank.groupBy("l_returnflag").agg(max("rn").as("m"))
      .collect().map(_.getInt(1))
    assert(ranks.forall(_ == 3))
  }
}
