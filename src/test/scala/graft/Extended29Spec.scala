package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-29 TPC-H analogs against independent local recomputations at
  * sf0.001 (DuckDB hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended29Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended29.queries(name)(spark, d)

  private lazy val li = Tables.t(spark, d, "lineitem")
    .select("l_partkey", "l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount").collect()

  test("q17 equals a driver-side recomputation of the correlated filter") {
    val byPart = li.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getDouble(2)).sum / rs.size
    }
    val brand = Tables.t(spark, d, "part")
      .filter(col("p_brand") === "Brand#4")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val want = li.filter(r => brand.contains(r.getLong(0)) &&
        r.getDouble(2) < 0.2 * byPart(r.getLong(0)))
      .map(r => math.round(r.getDouble(3) * 100)).sum / 100.0 / 7.0
    val got = q("q17_small_qty").collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-3)
  }

  test("q18 rows all exceed 250 units and are ordered by price desc") {
    val rows = q("q18_large_volume").collect()
    val qtyByOrder = li.groupBy(_.getLong(1))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2).toLong).sum }
    rows.foreach { r =>
      assert(r.getLong(5) > 250L)
      assert(qtyByOrder(r.getLong(2)) == r.getLong(5))
    }
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q19 revenue equals the brute-force OR-band recomputation") {
    val parts = Tables.t(spark, d, "part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val want = li.flatMap { r =>
      val (brand, size) = parts(r.getLong(0))
      val qty = r.getDouble(2)
      val in = (brand == "Brand#12" && size >= 1 && size <= 15 && qty >= 1 && qty <= 11) ||
        (brand == "Brand#23" && size >= 1 && size <= 25 && qty >= 10 && qty <= 20) ||
        (brand == "Brand#4" && size >= 1 && size <= 35 && qty >= 20 && qty <= 30)
      if (in) Some(math.round(r.getDouble(3) * 100) *
        math.round((1.0 - r.getDouble(4)) * 100))
      else None
    }.sum
    val got = q("q19_banded_revenue").collect().head.getDouble(0)
    assert(math.abs(got - want / 10000.0) < 0.011)
  }

  test("q22 counts only above-average-balance customers with no recent order") {
    val rows = q("q22_idle_balance").collect()
    val cust = Tables.t(spark, d, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    val avg = { val pos = cust.map(_._3).filter(_ > 0); pos.sum.toDouble / pos.size }
    val recent = Tables.t(spark, d, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val want = cust.filter(c => c._3 > avg && !recent.contains(c._1))
      .groupBy(_._2).map { case (nk, cs) =>
        nk -> (cs.size.toLong, cs.map(_._3).sum / 100.0) }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, tot) = want(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - tot) < 0.011)
    }
  }
}
