package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Relational operator surface from SURVEY.md §2, expressed over the
  * driver's synthetic tables so every operator has a DuckDB oracle.
  *
  * The reference's graph-shaped operators (adjacency, degree, lookups —
  * `edge_table.py:59-145`, `feature_table.py:615-625`) are exercised here on
  * the lineitem "edge set" with `_u = l_suppkey`, `_v = l_partkey`; the
  * GeoJSON-native equivalents live in [[graft.graph.PropertyGraph]] and are
  * covered by ScalaTest reference-parity specs.
  *
  * Conventions (driver hash-compare):
  *  - every column aliased identically in Spark and SQL;
  *  - deterministic ORDER BY on both sides;
  *  - double aggregates rounded (2-4 dp) so summation order can't flip a hash.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- aggregations (SURVEY §2.3) ----
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // A1 feature count (feature_table.py:615-619)
    "a1_count" -> ((s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("n"))),
    // A2 per-node out-degree via countDistinct (edge_table.py:104-134)
    "a2_degree" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_suppkey")
        .agg(countDistinct("l_partkey").as("out_degree"))
        .orderBy("l_suppkey")),
    // A2 at scale: HLL sketch degrees (approx_count_distinct) — mergeable,
    // one pass, no exact-distinct shuffle. Rows-only (DuckDB's HLL
    // implementation differs, so values can't hash-match an oracle).
    "a2_approx_degree" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_suppkey")
        .agg(approx_count_distinct("l_partkey").as("approx_out_degree"))
        .orderBy("l_suppkey")),
    // A3 size(weight) (graphs/digraphdb/__init__.py:62-66)
    "a3_weighted_size" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        round(sum(col("l_quantity")), 2).as("total_weight"),
        count(lit(1)).as("n_edges"))),
    // A4 envelope/MBR aggregate (feature_table.py:301-311)
    "a4_envelope" -> ((s, d) =>
      t(s, d, "customer").groupBy("c_mktsegment")
        .agg(
          round(min(col("c_acctbal")), 2).as("min_x"),
          round(max(col("c_acctbal")), 2).as("max_x"),
          min(col("c_custkey")).as("min_y"),
          max(col("c_custkey")).as("max_y"))
        .orderBy("c_mktsegment")),

    // exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // quantile_cont) — a Spark-side extension (§2.8: absent in reference)
    "a5_percentile" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"))
        .orderBy("l_returnflag")),
    // hierarchical aggregation via ROLLUP (subtotal + grand-total rows)
    "a6_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    // pivot: one column per linestatus value (manual CASE form in the
    // oracle — identical output columns)
    "f2_pivot" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_returnflag")),

    // ---- projections / filters / point lookups (SURVEY §2.2) ----
    // P1 get_edge(u,v): composite-key lookup (edge_table.py:136-145);
    // key resolved via min() scalar so it exists at every scale factor.
    "p1_get_edge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val k = li.agg(min("l_orderkey").as("k"))
      li.join(broadcast(k), li("l_orderkey") === k("k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy("l_linenumber")
    }),
    // P2 get_node (node_table.py:13-25)
    "p2_get_node" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") === 7)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acctbal"))),
    // P3 has_node (geopackagenetwork/__init__.py:87-99)
    "p3_has_node" -> ((s, d) =>
      t(s, d, "supplier").filter(col("s_suppkey") === 3)
        .agg((count(lit(1)) > 0).as("has_node"))),
    // P4 successors(n) (edge_table.py:83-102)
    "p4_successors" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_suppkey") === 3)
        .select(col("l_partkey").as("v")).distinct().orderBy("v")),
    "p4_predecessors" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_partkey") === 10)
        .select(col("l_suppkey").as("u")).distinct().orderBy("u")),
    // P5 successor_nodes(None): whole-table DISTINCT (edge_table.py:59-81)
    "p5_successor_nodes" -> ((s, d) =>
      t(s, d, "lineitem").select(col("l_partkey").as("v")).distinct().orderBy("v")),
    // P6 ingest filters (io.py:16-19,38-39)
    "p6_filter" -> ((s, d) =>
      t(s, d, "events")
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"))
        .orderBy("event_id")),
    // P7 engine-owned surrogate key (feature_table.py:554-560): the
    // reference CONTRACT is a dense insertion-order fid, which is a global
    // row_number by definition — kept here as the parity restatement. The
    // scale path for surrogate ids is the sparse monotonically_increasing_id
    // fid of the ingest tier (GeoJsonIngest, default above the dense gate).
    "p7_surrogate_fid" -> ((s, d) =>
      t(s, d, "orders")
        .select(row_number().over(Window.orderBy("o_orderkey")).as("fid"),
          col("o_orderkey"))
        .orderBy("o_orderkey")),
    // P8 graph-format reshaping (edge_table.py:147-159)
    "p8_reshape" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_suppkey").as("u"), col("l_partkey").as("v"),
          round(col("l_quantity"), 2).as("weight"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- joins (SURVEY §2.4) ----
    // J1 edges⋈nodes FK join; dims broadcast (small at any SF).
    "j1_join_fk" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      val na = t(s, d, "nation")
      li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    }),
    // J2 traversal as iterated self-join: 2-hop reachability.
    "j2_two_hop" -> ((s, d) => {
      val a = t(s, d, "lineitem").filter(col("l_suppkey") === 1)
        .select(col("l_partkey").as("pk")).distinct()
      t(s, d, "lineitem").join(broadcast(a), col("l_partkey") === col("pk"))
        .select(col("l_suppkey").as("reachable")).distinct().orderBy("reachable")
    }),
    // J4 update-by-key (edge_table.py:39-57): read-modify-write join.
    "j4_update_by_key" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"),
          when(col("c_acctbal") > 5000, lit("URGENT-VIP"))
            .otherwise(col("o_orderpriority")).as("priority"))
        .orderBy("o_orderkey")
    }),
    "j5_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "j6_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // ---- set ops / sort / top-k (Spark-side equivalents, SURVEY §2.8) ----
    "u1_union_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey")))
        .distinct().orderBy("nationkey")),
    "u2_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey")))
        .orderBy("nationkey")),
    "u3_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").filter(col("s_acctbal") > 9500)
          .select(col("s_nationkey")))
        .orderBy("nationkey")),
    "w3_window_battery" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"),
          rank().over(w).as("rnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "topk_orders" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(10)),

    // ---- window functions ----
    "w1_row_number" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),
    "w2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("running"))
        .orderBy("user_id", "event_id")
    }),

    // ---- upsert / derive-nodes write-path semantics (SURVEY §2.1 S5/S6) ----
    // S5/M3 last-wins dedup by key (feature_table.py:601-613)
    "s5_upsert_lastwins" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"))
        .orderBy("o_custkey")
    }),
    // S6 derive node set from edge endpoints (edge_table.py:5-33)
    "s6_derive_nodes" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.select(concat(lit("S"), col("l_suppkey").cast("string")).as("_n"))
        .union(li.select(concat(lit("P"), col("l_partkey").cast("string"))))
        .distinct().orderBy("_n")
    }),

    // ---- scalar functions ----
    "f1_scalar_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 5).as("name5"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        (col("p_size") % 7).as("m"))
        .orderBy("p_partkey")),

    // date part extraction
    "f3_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr", "mo")),
    // string-distance scalar (fuzzy matching building block)
    "f4_levenshtein" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("lev"),
          levenshtein(col("p_name"), col("p_brand")).as("lev2"))
        .orderBy("p_partkey")),
    // stream-enrichment pattern: events joined to a broadcast dimension
    "e7_enrich_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val c = t(s, d, "customer")
      ev.join(broadcast(c), ev("user_id") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("c_mktsegment")
    }),

    // ---- time / events ----
    "e1_hourly_agg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("hour_ts", "event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "a1_count" -> "SELECT count(*) AS n FROM lineitem",
    "a2_degree" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS out_degree
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",
    "a3_weighted_size" ->
      "SELECT round(sum(l_quantity),2) AS total_weight, count(*) AS n_edges FROM lineitem",
    "a4_envelope" ->
      """SELECT c_mktsegment, round(min(c_acctbal),2) AS min_x,
         round(max(c_acctbal),2) AS max_x, min(c_custkey) AS min_y,
         max(c_custkey) AS max_y
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "a5_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90,
         round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a6_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "f2_pivot" ->
      """SELECT l_returnflag,
         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "p1_get_edge" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
         FROM lineitem WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
         ORDER BY l_linenumber""",
    "p2_get_node" ->
      """SELECT c_custkey, c_name, c_nationkey, round(c_acctbal,2) AS acctbal
         FROM customer WHERE c_custkey = 7""",
    "p3_has_node" ->
      "SELECT count(*) > 0 AS has_node FROM supplier WHERE s_suppkey = 3",
    "p4_successors" ->
      """SELECT DISTINCT l_partkey AS v FROM lineitem WHERE l_suppkey = 3 ORDER BY v""",
    "p4_predecessors" ->
      """SELECT DISTINCT l_suppkey AS u FROM lineitem WHERE l_partkey = 10 ORDER BY u""",
    "p5_successor_nodes" ->
      "SELECT DISTINCT l_partkey AS v FROM lineitem ORDER BY v",
    "p6_filter" ->
      """SELECT event_id, user_id, round(value,2) AS value FROM events
         WHERE event_type = 'purchase' AND value IS NOT NULL ORDER BY event_id""",
    "p7_surrogate_fid" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS fid, o_orderkey
         FROM orders ORDER BY o_orderkey""",
    "p8_reshape" ->
      """SELECT l_suppkey AS u, l_partkey AS v, round(l_quantity,2) AS weight,
         l_orderkey, l_linenumber
         FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""",
    "j1_join_fk" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
         count(*) AS n
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "j2_two_hop" ->
      """SELECT DISTINCT b.l_suppkey AS reachable FROM lineitem b
         WHERE b.l_partkey IN (SELECT l_partkey FROM lineitem WHERE l_suppkey = 1)
         ORDER BY reachable""",
    "j4_update_by_key" ->
      """SELECT o_orderkey,
         CASE WHEN c_acctbal > 5000 THEN 'URGENT-VIP' ELSE o_orderpriority END AS priority
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "j5_anti_join" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j6_semi_join" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "u1_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)
         ORDER BY nationkey""",
    "u2_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "u3_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500
         ORDER BY nationkey""",
    "w3_window_battery" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_orderkey) OVER w AS prev_order,
         lead(o_orderkey) OVER w AS next_order,
         rank() OVER w AS rnk,
         ntile(4) OVER w AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
         ORDER BY price DESC, o_orderkey ASC LIMIT 10""",
    "w1_row_number" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "w2_running_sum" ->
      """SELECT user_id, event_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running
         FROM events ORDER BY user_id, event_id""",
    "s5_upsert_lastwins" ->
      """SELECT o_custkey, o_orderkey AS latest_order FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
    "s6_derive_nodes" ->
      """SELECT DISTINCT _n FROM (
           SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS _n FROM lineitem
           UNION ALL SELECT 'P' || CAST(l_partkey AS VARCHAR) FROM lineitem)
         ORDER BY _n""",
    "f1_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name,1,5) AS name5,
         round(sqrt(p_retailprice),4) AS sq, p_size % 7 AS m
         FROM part ORDER BY p_partkey""",
    "f3_date_funcs" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY yr, mo ORDER BY yr, mo""",
    "f4_levenshtein" ->
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS lev,
         levenshtein(p_name, p_brand) AS lev2
         FROM part ORDER BY p_partkey""",
    "e7_enrich_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "e1_hourly_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
         count(*) AS n, round(sum(value),2) AS total
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type"""
  )
}
