package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the fifth extension batch (Spark 4 SQL surface). */
class Extended5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("j12 recursive CTE reaches every in-bound order with dense per-customer positions") {
    val out = q("j12_recursive_chain").cache()
    val orders = Tables.t(spark, sf, "orders")
    // the iterative union visits each order once, up to the depth bound (8)
    val want = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .agg(sum(least(col("n"), lit(8)))).head.getLong(0)
    assert(out.count() == want)
    val bad = out.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"),
        countDistinct("pos").as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("j12 executes through the recursive-union operator, not a rewrite") {
    val plan = q("j12_recursive_chain").queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop") || plan.contains("RecursiveRelation"),
      s"expected a recursive execution node in:\n$plan")
  }

  test("variant-at-ingest: stored VARIANT column answers e14 identically, parse-free") {
    val out = java.nio.file.Files.createTempDirectory("variant_ingest").toString
    try {
      graft.ingest.VariantIngest
        .parseAtIngest(Tables.t(spark, sf, "events"), "props", "props_v")
        .write.mode("overwrite").parquet(out)
      val stored = spark.read.parquet(out)
      // the 100 TB read path: typed variant_get over the stored binary —
      // no parse_json anywhere in the plan
      val df = stored
        .select(variant_get(col("props_v"), "$.k", "int").as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("k")
      assert(!df.queryExecution.executedPlan.toString.contains("parse_json"),
        "stored-variant read path must not re-parse")
      val got = df.collect()
      val want = q("e14_variant_json").collect()
      assert(got.sameElements(want))
    } finally graft.store.GraphPackage.deleteRecursive(java.nio.file.Paths.get(out))
  }

  test("f10 unpivot triples the row count and keeps per-measure cardinality") {
    val li = Tables.t(spark, sf, "lineitem").count()
    val out = q("f10_unpivot").collect()
    assert(out.length == 3 && out.forall(_.getLong(1) == li))
  }

  test("f11 listagg emits one comma-separated status per order, in order") {
    val out = q("f11_listagg")
    val counts = Tables.t(spark, sf, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    // single-char statuses joined by ',' -> length is exactly 2n-1
    val bad = out.join(counts, "o_custkey")
      .filter(length(col("statuses")) =!= col("n") * 2 - 1)
    assert(bad.isEmpty)
  }

  test("e14 variant extraction covers every event with a non-null key") {
    val out = q("e14_variant_json")
    assert(out.filter(col("k").isNull).isEmpty)
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("f12 regex battery recovers the customer key embedded in the name") {
    val out = q("f12_regex_battery")
    assert(out.filter(col("name_id") =!= col("c_custkey")).isEmpty)
  }

  test("f13 try_divide yields null exactly on the zero-discount rows") {
    val li = Tables.t(spark, sf, "lineitem")
    val zeros = li.filter(col("l_discount") === 0).count()
    assert(zeros > 0, "fixture must contain zero discounts for this test to bite")
    val out = q("f13_try_null_battery")
    assert(out.filter(col("per_disc").isNull).count() == zeros)
    assert(out.filter(col("per_disc").isNull =!= col("disc_or_null").isNull).isEmpty)
    assert(out.filter(col("disc_or_neg").isNull).isEmpty)
  }
}
