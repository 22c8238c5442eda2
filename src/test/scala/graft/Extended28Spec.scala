package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-28 TPC-H analogs against independent local recomputations at
  * sf0.001 (the DuckDB hash gate runs at sf0.01 via Verify/oracle_check).
  */
class Extended28Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended28.queries(name)(spark, d)

  test("q12 buckets partition the joined 1997 lineitems exactly") {
    val rows = q("q12_late_priority").collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ==
      rows.map(_.getString(0)).toSeq.distinct.sorted)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = Tables.t(spark, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.t(spark, d, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == expected)
  }

  test("q13 distribution accounts for every customer exactly once") {
    val dist = q("q13_order_dist").collect()
    val nCust = Tables.t(spark, d, "customer").count()
    assert(dist.map(_.getLong(1)).sum == nCust)
    // zero-order customers appear in the c_count=0 bucket
    val withOrders = Tables.t(spark, d, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.t(spark, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey").distinct().count()
    val zeroBucket = dist.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket == nCust - withOrders)
  }

  test("q14 promo share is in (0, 100) and matches a float recomputation") {
    val pct = q("q14_promo_revenue").collect().head.getDouble(0)
    assert(pct > 0.0 && pct < 100.0)
    val li = Tables.t(spark, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01") &&
        col("l_shipdate") < lit("1997-10-01"))
      .join(Tables.t(spark, d, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .collect()
    val promo = li.filter(_.getString(0) == "PROMO").map(_.getDouble(1)).sum
    val total = li.map(_.getDouble(1)).sum
    assert(math.abs(pct - 100.0 * promo / total) < 1e-3)
  }

  test("q15 returns exactly the argmax suppliers of the quarter") {
    val rows = q("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    val perSupp = Tables.t(spark, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .select(col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
         round((lit(1.0) - col("l_discount")) * 100).cast("long")).as("rs"))
      .groupBy("l_suppkey").agg(sum("rs").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = perSupp.map(_._2).max
    val want = perSupp.filter(_._2 == mx).map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet == want)
    assert(math.abs(rows.head.getDouble(2) - mx / 10000.0) < 0.011)
  }
}
