package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** Semantic invariants for the third extension batch. */
class Extended3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("TopKAgg equals sort-and-take regardless of merge order") {
    val agg = new TopKAgg(3)
    val rnd = new scala.util.Random(11)
    val data = (1 to 500).map(_ => (rnd.nextInt(50).toDouble, rnd.nextLong(1000)))
    val want = data.sortBy { case (s, k) => (-s, k) }.take(3).map(_._2).mkString(",")
    // single-buffer reduce
    val whole = data.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(whole) == want)
    // arbitrary partition + merge tree
    val parts = data.grouped(37).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    assert(agg.finish(merged) == want)
  }

  test("e11 SCD2 intervals chain: valid_to equals the next valid_from per user") {
    val out = q("e11_scd2")
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val bad = out.withColumn("nf", lead("valid_from", 1).over(w))
      .filter(
        (col("nf").isNotNull && col("valid_to") =!= col("nf")) ||
        (col("nf").isNull && col("valid_to").isNotNull))
    assert(bad.isEmpty)
    // consecutive intervals always change type
    val sameType = out.withColumn("nt", lead("event_type", 1).over(w))
      .filter(col("nt").isNotNull && col("nt") === col("event_type"))
    assert(sameType.isEmpty)
  }

  test("f8 generator battery preserves cardinality with dense per-group ordinals") {
    val out = q("f8_generator_battery").cache()
    val liCount = Tables.t(spark, sf, "lineitem").count()
    assert(out.count() == liCount)
    val bad = out.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("a11 UDAF top3 equals the window-function formulation") {
    val li = Tables.t(spark, sf, "lineitem")
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("l_returnflag")
      .agg(concat_ws(",", collect_list(col("l_orderkey"))).as("top3"))
    // collect_list after an orderBy inside groupBy isn't order-stable in
    // general, so sort explicitly via array_sort on (rn, key) structs
    val viaStructs = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("l_returnflag")
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("l_orderkey")))),
        s => s.getField("l_orderkey").cast("string")), ",").as("top3"))
    val got = q("a11_topk_udaf").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    viaStructs.collect().foreach { r =>
      assert(got(r.getString(0)) == r.getString(1), s"flag ${r.getString(0)}")
    }
  }

  test("s7 roundtrip doubles the base aggregate exactly") {
    val li = Tables.t(spark, sf, "lineitem")
    val base = li.groupBy("l_returnflag").agg(count(lit(1)).as("b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q("s7_format_roundtrip").collect().foreach { r =>
      assert(r.getAs[Long]("n") == 2 * base(r.getString(0)))
    }
  }

  test("s8 partition-pruned read touches only the selected day's files") {
    // run the query once so the partitioned sink exists
    q("s8_partition_prune").collect()
    val dir = graft.queries.Scratch.dir("s8", sf)
    val all = spark.read.parquet(dir)
    val days = all.select("day").distinct().count()
    val firstDay = all.agg(min("day")).head.getDate(0)
    val pruned = all.filter(col("day") === firstDay)
    assert(days > 1)
    // partition pruning: the executed scan reads a strict subset of files
    // (inputFiles is pre-pruning, so read the scan's numFiles metric)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec => f.metrics("numFiles").value
      }
      scans.sum
    }
    val prunedFiles = filesRead(pruned)
    val allFiles = filesRead(all)
    assert(prunedFiles > 0 && prunedFiles < allFiles, s"$prunedFiles vs $allFiles")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
  }

  test("observe() attaches pipeline metrics without a second scan") {
    val obs = new org.apache.spark.sql.Observation("li_stats")
    val li = Tables.t(spark, sf, "lineitem")
      .observe(obs, count(lit(1)).as("rows"),
        sum("l_quantity").cast("long").as("qty"),
        max("l_extendedprice").as("maxp"))
    // one action drives both the query and the metrics
    val kept = li.filter(col("l_quantity") >= 25).count()
    val m = obs.get
    val total = Tables.t(spark, sf, "lineitem").count()
    assert(m("rows") == total && kept < total)
    assert(m("qty").asInstanceOf[Long] > 0)
  }

  test("j10 component ids are the min orderkey of each customer chain") {
    val orders = Tables.t(spark, sf, "orders")
    val expect = orders
      .withColumn("mn", min("o_orderkey").over(Window.partitionBy("o_custkey")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_custkey")))
      .filter(col("n") >= 2)
      .select("o_orderkey", "mn")
    val bad = q("j10_connected_components").join(expect, "o_orderkey")
      .filter(col("component") =!= col("mn"))
    assert(bad.isEmpty)
  }
}
