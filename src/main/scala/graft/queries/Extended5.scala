package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 5 — the Spark 4 SQL surface the
  * reference never had: native recursive CTE traversal, unpivot (melt),
  * ordered listagg, the VARIANT semi-structured type, a regex scalar
  * battery, and try_/null-handling scalars — each with a DuckDB oracle.
  */
object Extended5 {
  type Q = (SparkSession, String) => DataFrame

  /** The previous j12 invocation's cached successor relation. Each call
    * builds a fresh plan, so a plain cache() could never be matched by an
    * unpersist and leaked one executor-memory entry per invocation for the
    * session's lifetime; swapping through this reference bounds live
    * entries to exactly one (released the moment the next call replaces
    * it, or by a harness-level clearCache).
    */
  private val lastOrderEdges =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  val queries: Map[String, Q] = Map(
    // ---- native WITH RECURSIVE: walk each customer's order chain ----
    // The iterative-union operator inside one SQL statement (the j3 BFS is
    // the same shape driven from the host language). The fixpoint is each
    // order's position in its customer's chain — first 8 positions: each
    // UnionLoop step costs a fixed re-plan+job (~0.5 s regardless of data
    // or partition count), so the walk depth, not row count, prices the
    // query. The oracle states the fixpoint directly with row_number.
    "j12_recursive_chain" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val orders = t(s, d, "orders")
      orders.createOrReplaceTempView("v_orders")
      // materialize the successor relation once: inlined as a CTE it would
      // be re-derived (window included) on every recursive step — measured
      // 7x slower at sf0.1 over ~24 iterations. cache() materializes
      // lazily inside the first recursive step, and Spark's CacheManager
      // dedups by canonical plan, so a repeat invocation over the same
      // dataset REUSES the live entry (never accumulates). Unpersist the
      // previous invocation's relation only when it is a genuinely
      // different plan (another dataset dir) — unpersisting an identical
      // plan would evict the entry this call just registered, leaving the
      // whole recursion uncached (measured 2.5x slower).
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = orders.select(col("o_custkey"), col("o_orderkey"),
          lead("o_orderkey", 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
      val prev = lastOrderEdges.getAndSet(edges)
      if (prev != null &&
          !prev.queryExecution.analyzed.sameResult(edges.queryExecution.analyzed))
        prev.unpersist(blocking = false)
      edges.cache().createOrReplaceTempView("v_order_edges")
      s.sql("""
        WITH RECURSIVE walk AS (
          SELECT o_custkey, min(o_orderkey) AS o_orderkey, CAST(0 AS BIGINT) AS pos
          FROM v_orders GROUP BY o_custkey
          UNION ALL
          SELECT /*+ BROADCAST(e) */
            e.o_custkey, e.nxt AS o_orderkey, w.pos + 1 AS pos
          FROM walk w JOIN v_order_edges e
            ON w.o_custkey = e.o_custkey AND w.o_orderkey = e.o_orderkey
          WHERE w.pos < 7)
        SELECT o_custkey, o_orderkey, pos FROM walk
        ORDER BY o_custkey, pos""")
    }),

    // ---- unpivot (melt): wide measures to long (measure, val) pairs ----
    "f10_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("total"))
        .orderBy("measure")),

    // ---- ordered listagg: one deterministic string per group ----
    "f11_listagg" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_custkey,
          listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderkey) AS statuses
        FROM v_orders GROUP BY o_custkey ORDER BY o_custkey""")
    }),

    // ---- VARIANT: parse once, typed path extraction ----
    // The Spark 4 semi-structured type (binary-encoded, pushdown-friendly)
    // instead of per-access string parsing (e6's get_json_object form).
    "e14_variant_json" -> ((s, d) =>
      t(s, d, "events")
        .select(variant_get(parse_json(col("props")), "$.k", "int").as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("k")),

    // ---- regex scalar battery ----
    "f12_regex_battery" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_id"),
          regexp_count(col("c_name"), lit("0")).as("zeros"),
          length(regexp_replace(lower(col("c_mktsegment")), "[^aeiou]", "")).as("vowels"),
          size(split(col("c_mktsegment"), "")).as("seg_chars"))
        .orderBy("c_custkey")),

    // ---- try_/null-handling scalars ----
    "f13_try_null_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(try_divide(col("l_extendedprice"), col("l_discount")), 2).as("per_disc"),
          nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_neg"),
          when(col("l_discount") === 0, lit(null).cast("double"))
            .otherwise(col("l_quantity")).as("qty_if_disc"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracleSql: Map[String, String] = Map(
    "j12_recursive_chain" ->
      """SELECT o_custkey, o_orderkey, pos FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1
               AS BIGINT) AS pos
           FROM orders)
         WHERE pos <= 7 ORDER BY o_custkey, pos""",
    "f10_unpivot" ->
      """SELECT measure, count(*) AS n, round(sum(val), 2) AS total FROM (
           SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT 'l_discount', l_discount FROM lineitem)
         GROUP BY measure ORDER BY measure""",
    "f11_listagg" ->
      """SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "e14_variant_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS INT) AS k,
           count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY k ORDER BY k""",
    "f12_regex_battery" ->
      """SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_id,
           length(c_name) - length(regexp_replace(c_name, '0', '', 'g')) AS zeros,
           length(regexp_replace(lower(c_mktsegment), '[^aeiou]', '', 'g')) AS vowels,
           length(c_mktsegment) AS seg_chars
         FROM customer ORDER BY c_custkey""",
    "f13_try_null_battery" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 2) END AS per_disc,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg,
           CASE WHEN l_discount = 0 THEN NULL ELSE l_quantity END AS qty_if_disc
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""
  )
}
