package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and scale-mechanism proofs for the TPC-H-shaped batch, plus
  * the runtime-filtering features (dynamic partition pruning, bloom-filter
  * join pruning) and sketch mergeability a 100 TB deployment leans on.
  */
class Extended6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q4/q5 broadcast their dimension sides; no shuffle of the fact for dims") {
    Seq("q4_shipping_priority", "q5_region_volume").foreach { name =>
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name should broadcast dims")
    }
  }

  test("q6 pushes every predicate into the parquet scan") {
    val plan = q("q6_revenue_delta").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(plan.contains(c), s"predicate on $c must reach the scan"))
    // only the needed columns are read
    assert(!plan.contains("l_returnflag"))
  }

  test("joining a day-partitioned fact against a filtered dim prunes partitions dynamically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // a dim whose filter is selective but only resolvable at runtime
    val dim = ev.select("day").distinct()
      .filter(dayofmonth(col("day")) === 1 && month(col("day")) === 1)
    val joined = fact.join(dim, "day").groupBy("event_type").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n${plan.take(4000)}")
    assert(joined.collect().nonEmpty)
  }

  test("a selective dim join injects a runtime bloom filter on the fact side") {
    val conf = spark.conf
    val savedBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedScan = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try {
      // force a shuffle join (bloom filters don't apply to broadcast joins,
      // where the build side already prunes) and drop the 10 GB
      // application-side floor so the mechanism fires at test scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.t(spark, sf, "lineitem")
      val dim = Tables.t(spark, sf, "part").filter(col("p_type") === "ECONOMY")
      val j = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_type").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter in:\n${plan.take(4000)}")
      assert(j.collect().nonEmpty)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        savedScan)
    }
  }

  test("HLL sketches are mergeable: sharded union == single pass, near exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct("user_id")).head.getLong(0)
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    val merged = ev.groupBy(pmod(col("user_id"), lit(8)).as("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    // distributivity: partial sketches union to the same estimate
    assert(merged == whole)
    assert(math.abs(merged - exact) <= math.max(1L, (0.05 * exact).toLong),
      s"estimate $merged vs exact $exact")
  }
}
