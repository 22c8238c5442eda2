package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-31 TPC-H analogs against independent local recomputations at
  * sf0.001 (DuckDB hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended31.queries(name)(spark, d)

  private lazy val ps = Tables.t(spark, d, "lineitem")
    .select("l_partkey", "l_suppkey").distinct().collect()
    .map(r => (r.getLong(0), r.getLong(1)))

  test("q2b picks the max-balance (tie: min suppkey) European supplier per part") {
    val eu = Tables.t(spark, d, "supplier")
      .join(Tables.t(spark, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.t(spark, d, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    val size15 = Tables.t(spark, d, "part").filter(col("p_size") === 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val want = ps.filter(p => size15(p._1) && eu.contains(p._2))
      .groupBy(_._1).map { case (pk, pairs) =>
        pk -> pairs.map(_._2).minBy(sk => (-eu(sk), sk)) }
    val got = q("q2b_best_supplier").collect()
    got.foreach { r =>
      val pk = r.getLong(3)
      val bal = r.getDouble(0)
      assert(math.abs(bal - eu(want(pk)) / 100.0) < 0.005)
    }
    // top-20 window: every listed balance >= any unlisted part's best balance
    if (got.length == 20) {
      val listed = got.map(_.getLong(3)).toSet
      val minListed = got.map(_.getDouble(0)).min
      want.filterNot(kv => listed(kv._1)).foreach { case (_, sk) =>
        assert(eu(sk) / 100.0 <= minListed + 1e-9)
      }
    }
  }

  test("q16 supplier counts match the driver-side distinct count") {
    val parts = Tables.t(spark, d, "part")
      .filter(col("p_brand") =!= "Brand#4" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val want = ps.filter(p => parts.contains(p._1))
      .groupBy(p => parts(p._1))
      .map { case (k, pairs) => k -> pairs.map(_._2).distinct.size.toLong }
    val got = q("q16_supplier_cnt").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3))).toMap
    assert(got == want)
  }

  test("q20 keeps exactly the suppliers above 1/6 promo share") {
    val rows = q("q20_promo_share").collect()
    rows.foreach(r => assert(r.getLong(2) * 6 > r.getLong(3)))
    val li = Tables.t(spark, d, "lineitem")
      .join(Tables.t(spark, d, "part"), col("l_partkey") === col("p_partkey"))
      .select("l_suppkey", "p_type", "l_quantity").collect()
    val per = li.groupBy(_.getLong(0)).map { case (sk, rs) =>
      sk -> (rs.map(_.getDouble(2).toLong).sum,
        rs.filter(_.getString(1) == "PROMO").map(_.getDouble(2).toLong).sum) }
    val want = per.filter { case (_, (tq, pq)) => pq * 6 > tq }.keySet
    assert(rows.map(_.getLong(0)).toSet == want)
  }

  test("q21 counts orders where the supplier was the sole late shipper") {
    val rows = q("q21_sole_late").collect()
    val li = Tables.t(spark, d, "lineitem")
      .join(Tables.t(spark, d, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val perOS = li.groupBy(r => (r._1, r._2))
      .map { case ((o, s), rs) => (o, s, rs.exists(_._3)) }.toSeq
    val soleLate = perOS.groupBy(_._1).filter { case (_, ss) =>
      ss.size >= 2 && ss.count(_._3) == 1 }.keySet
    val want = perOS.filter(r => r._3 && soleLate(r._1))
      .groupBy(_._2).map { case (s, rs) => s -> rs.size.toLong }
    rows.foreach(r => assert(want(r.getLong(1)) == r.getLong(2)))
  }
}
