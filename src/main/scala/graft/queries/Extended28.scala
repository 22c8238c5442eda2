package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 28: the remaining TPC-H shapes
  * expressible on the driver's TPC-H-lite schema (no partsupp, no
  * commit/receipt dates, so Q12/Q15-style queries use o_orderdate-based
  * lateness and the available measures; Q2/Q11/Q16/Q20 are out of reach
  * by data, not by engine). Reference parity: entwiner exposes its edge
  * tables to arbitrary relational consumers (`entwiner/graphs/digraphdb
  * .py:24-41` hands back SQL-queryable tables), so the relational battery
  * is the "what" — each query here is the standard decision-support shape
  * restated Spark-first.
  *
  * Determinism: every money sum is computed in scaled int64
  * (price×100 × (1−disc)×100 are exact ints) with a single terminal
  * division, so results are bit-identical across engines and row orders
  * — the q10 convention. Counts/mins/maxes are exact by nature.
  *
  * Scale notes (100 TB): q12/q14 are single-shuffle fact aggregations
  * after a fact-fact join on the orderkey (SMJ/bucketable); q13 is a
  * broadcast-right left join (orders aggregated first, so the join input
  * is |customers|+|custkey partials|, not raw orders); q15 aggregates
  * lineitem per supplier then broadcasts the 1-row max — no windowed
  * global sort on the fact side.
  */
object Extended28 {
  type Q = (SparkSession, String) => DataFrame

  /** rev_scaled = round(price*100) * round((1-disc)*100): exact int64. */
  private def revScaled = (round(col("l_extendedprice") * 100).cast("long") *
    round((lit(1.0) - col("l_discount")) * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // ---- TPC-H Q12 analog: shipping lateness vs order priority ----
    // No l_shipmode/l_commitdate in the lite schema: the Q12 question
    // ("does slow shipping correlate with priority?") is kept by
    // bucketing on >90-day ship lag instead of ship mode.
    "q12_late_priority" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select("l_orderkey", "l_shipdate")
      val o = t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            lit("LATE"))
            .otherwise(lit("ONTIME")).as("ship_bucket"),
          col("o_orderpriority"))
        .groupBy("ship_bucket")
        .agg(
          count_if(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .as("high_line_count"),
          count_if(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .as("low_line_count"))
        .orderBy("ship_bucket")
    }),

    // ---- TPC-H Q13: customer order-count distribution ----
    // Aggregate orders per custkey FIRST (one shuffle on o_custkey), then
    // left-join customers to the partials: the join carries one row per
    // customer, never raw orders. The priority filter stands in for Q13's
    // comment NOT LIKE predicate.
    "q13_order_dist" -> ((s, d) => {
      val perCust = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("c_count"))
      t(s, d, "customer").select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- TPC-H Q14: promotion revenue share ----
    // Both the PROMO and total revenue accumulate as exact scaled ints in
    // ONE aggregation pass (conditional sum), then a single double
    // division — bit-stable and one shuffle over the month of fact rows.
    "q14_promo_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01") &&
          col("l_shipdate") < lit("1997-10-01"))
        .select(col("l_partkey"), revScaled.as("rs"))
      val p = t(s, d, "part").select("p_partkey", "p_type")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rs")).otherwise(lit(0L)))
            .as("promo_rs"),
          sum(col("rs")).as("total_rs"))
        .select(round(lit(100.0) * col("promo_rs") / col("total_rs"), 6)
          .as("promo_pct"))
    }),

    // ---- TPC-H Q15: top supplier(s) by quarterly revenue ----
    // Per-supplier revenue is one partial-agg shuffle; the global max is a
    // 1-row broadcast joined back (ties all kept, as Q15 specifies) — no
    // global Window sort over the supplier partials. Revenue compared as
    // exact int64, so "equals max" has no float-equality hazard.
    "q15_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .select(col("l_suppkey"), revScaled.as("rs"))
        .groupBy("l_suppkey").agg(sum("rs").as("total_rs"))
      val top = rev.agg(max("total_rs").as("max_rs"))
      val sup = t(s, d, "supplier").select("s_suppkey", "s_name")
      rev.join(broadcast(top), col("total_rs") === col("max_rs"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_rs").cast("double") / 10000.0, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q12_late_priority" ->
      """SELECT
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT)
             AS high_line_count,
           CAST(count_if(o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
             AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q13_order_dist" ->
      """WITH per_cust AS (
           SELECT o_custkey, count(*) AS c_count FROM orders
           WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey)
         SELECT coalesce(c_count, 0) AS c_count, count(*) AS custdist
         FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    "q14_promo_revenue" ->
      """SELECT round(100.0 *
           sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(round(l_extendedprice * 100) AS BIGINT) *
                    CAST(round((1.0 - l_discount) * 100) AS BIGINT)
               ELSE 0 END) /
           sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
               CAST(round((1.0 - l_discount) * 100) AS BIGINT)), 6) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-09-01'
           AND l_shipdate < TIMESTAMP '1997-10-01'""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                 CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS total_rs
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
           round(CAST(total_rs AS DOUBLE) / 10000.0, 2) AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rs = (SELECT max(total_rs) FROM rev)
         ORDER BY s_suppkey"""
  )
}
