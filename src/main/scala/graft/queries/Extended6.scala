package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 6: TPC-H-shaped analytics over the
  * full star schema — the canonical multi-join + aggregate + top-k plans a
  * warehouse engine is judged on. Dimension sides are broadcast; fact-side
  * predicates are pushed to the scan; plan shapes pinned in Extended6Spec.
  */
object Extended6 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- Q3 analog: shipping priority (3-way join, agg, top-10) ----
    "q4_shipping_priority" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-06-01"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-06-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ---- Q5 analog: regional supplier volume (6-way join) ----
    "q5_region_volume" -> ((s, d) => {
      val dims = t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(dims),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- Q6 analog: forecast revenue change (pure pushdown filter-agg) ----
    "q6_revenue_delta" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.04, 0.06) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")))
  )

  val oracleSql: Map[String, String] = Map(
    "q4_shipping_priority" ->
      """SELECT l_orderkey, revenue, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
         FROM (
           SELECT l_orderkey, o_orderdate, o_orderpriority,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-06-01'
             AND l_shipdate > TIMESTAMP '1998-06-01'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority)
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_region_volume" ->
      """SELECT n_name,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q6_revenue_delta" ->
      """SELECT count(*) AS n,
           round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.04 AND 0.06
           AND l_quantity < 24"""
  )
}
