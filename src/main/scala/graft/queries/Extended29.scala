package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 29: TPC-H Q17/Q18/Q19/Q22 analogs on
  * the lite schema (no p_container/c_phone — brand+size and nationkey
  * stand in). Same determinism discipline as batch 28: money sums in
  * scaled int64 with one terminal division; quantity sums are exact
  * (integer-valued doubles); threshold comparisons derive from exact
  * integer sums so both engines evaluate identical doubles.
  *
  * Scale notes (100 TB): q17's correlated per-part average becomes one
  * partial-agg shuffle over (partkey) joined back to the brand's rows —
  * never a per-row subquery; q18 is a single groupBy(orderkey) with the
  * HAVING pushed before the dimension joins (only qualifying orders join
  * customers); q19's OR-of-ANDs predicate is a map-side filter under one
  * broadcast join (2k parts); q22 aggregates orders once per custkey
  * (anti-join against recent orders) and broadcasts the 1-row average.
  */
object Extended29 {
  type Q = (SparkSession, String) => DataFrame

  private def revScaled = (round(col("l_extendedprice") * 100).cast("long") *
    round((lit(1.0) - col("l_discount")) * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // ---- TPC-H Q17: small-quantity-order revenue for one brand ----
    // avg qty per part from exact integer sums; lineitems below 20% of
    // their part's average contribute price; result = yearly-loss proxy
    // sum(extendedprice)/7 as Q17 specifies.
    "q17_small_qty" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
      val brandParts = t(s, d, "part").filter(col("p_brand") === "Brand#4")
        .select("p_partkey")
      val perPart = li.groupBy("l_partkey")
        .agg((sum(col("l_quantity").cast("long")).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .join(perPart.withColumnRenamed("l_partkey", "ap_partkey"),
          col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("ps"))
        .select(round(col("ps").cast("double") / 100.0 / 7.0, 4).as("avg_yearly"))
    }),

    // ---- TPC-H Q18: large-volume customers ----
    // The HAVING runs on the orderkey partials BEFORE any dimension join:
    // at scale only the handful of 250+-unit orders ever touch the
    // customer table.
    "q18_large_volume" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 250L)
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // ---- TPC-H Q19: OR-of-ANDs discounted revenue ----
    // Three brand/size/quantity bands OR-ed together — the classic
    // "pushdown through disjunction" shape. One broadcast join; the
    // predicate evaluates map-side over the scan.
    "q19_banded_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), revScaled.as("rs"))
      val p = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
      val banded = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
      banded.agg(sum("rs").as("rs"))
        .select(round(col("rs").cast("double") / 10000.0, 2).as("revenue"))
    }),

    // ---- TPC-H Q22: idle customers with above-average balance ----
    // "Positive-balance average" broadcasts as one row; customers with no
    // order since 2000-01-01 are a left-anti against the aggregated
    // custkey set (not raw orders); final rollup per nation in scaled
    // cents.
    "q22_idle_balance" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_scaled"))
      val avgPos = c.filter(col("bal_scaled") > 0L)
        .agg((sum("bal_scaled").cast("double") / count(lit(1))).as("avg_bal"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("o_custkey").distinct()
      c.join(broadcast(avgPos))
        .filter(col("bal_scaled").cast("double") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum("bal_scaled").as("tb"))
        .select(col("c_nationkey"), col("numcust"),
          round(col("tb").cast("double") / 100.0, 2).as("totacctbal"))
        .orderBy("c_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q17_small_qty" ->
      """WITH per_part AS (
           SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                      / 100.0 / 7.0, 4) AS avg_yearly
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN per_part USING (l_partkey)
         WHERE p_brand = 'Brand#4' AND l_quantity < 0.2 * avg_qty""",
    "q18_large_volume" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
         SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, total_qty
         FROM big
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 20""",
    "q19_banded_revenue" ->
      """SELECT round(CAST(sum(
             CAST(round(l_extendedprice * 100) AS BIGINT) *
             CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
           / 10000.0, 2) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    "q22_idle_balance" ->
      """WITH cb AS (
           SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_scaled
           FROM customer),
         avg_pos AS (
           SELECT CAST(sum(bal_scaled) AS DOUBLE) / count(*) AS avg_bal
           FROM cb WHERE bal_scaled > 0),
         recent AS (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '2000-01-01')
         SELECT c_nationkey, count(*) AS numcust,
           round(CAST(sum(bal_scaled) AS DOUBLE) / 100.0, 2) AS totacctbal
         FROM cb, avg_pos
         WHERE CAST(bal_scaled AS DOUBLE) > avg_bal
           AND c_custkey NOT IN (SELECT o_custkey FROM recent)
         GROUP BY c_nationkey ORDER BY c_nationkey"""
  )
}
