package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-3 surface extensions, batch 13: map-typed columns, conditional
  * aggregates (count_if / bool_and / bool_or / deterministic mode),
  * histogram bucketing, string→map parsing, and grouping_id introspection
  * over cube lattices — each with a DuckDB oracle.
  */
object Extended13 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- map-typed column battery ----
    // Per-order map linenumber→quantity built once in a partial-aggregable
    // collect_list; all downstream access (size / lookup / key list) is
    // map-side. Maps stay engine-internal — the oracle compares extracted
    // scalars, the portable surface of the type.
    "f20_map_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        // linenumbers repeat within synthetic orders: pre-aggregate so map
        // keys are unique (maps reject duplicate keys by design)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(sum("l_quantity").as("qty"))
        .groupBy("l_orderkey")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("l_linenumber"), col("qty"))))).as("m"))
        .select(col("l_orderkey"),
          size(col("m")).as("n_lines"),
          element_at(col("m"), 1).as("qty_ln1"),
          concat_ws(",", map_keys(col("m"))).as("lns"))
        .orderBy("l_orderkey")),

    // ---- conditional aggregates ----
    // count_if / bool_and / bool_or fold predicates inside one hash agg
    // (no self-joins); mode(…, deterministic=true) pins tie-breaks to the
    // smallest value so the result is reproducible cluster-wide.
    "f21_conditional_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_if(col("l_quantity") > 25).as("n_big"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_deep_disc"),
          mode(col("l_linenumber"), deterministic = true).as("mode_ln"))
        .orderBy("l_returnflag")),

    // ---- histogram bucketing ----
    // width_bucket with integer-aligned bounds ((51-1)/10 divides evenly),
    // so bucket edges are exact in IEEE arithmetic on any engine. The
    // per-bucket count is the partial-aggregable histogram build.
    "f22_histogram_bucket" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(width_bucket(col("l_quantity"), lit(1.0), lit(51.0), lit(10)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // ---- string → map parsing ----
    // str_to_map over a synthesized "k:v,k:v" line (integer values only so
    // text round-trips are exact); the oracle reads the same fields back
    // with anchored regexes.
    "f23_str_to_map" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("line", concat(
          lit("ln:"), col("l_linenumber"),
          lit(",ok:"), col("l_orderkey"),
          lit(",sk:"), col("l_suppkey")))
        .withColumn("m", expr("str_to_map(line, ',', ':')"))
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(col("m"), "ln").cast("long").as("ln"),
          element_at(col("m"), "sk").cast("long").as("sk"),
          size(col("m")).as("n_keys"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- grouping_id over a cube lattice ----
    // The bitmask distinguishing which grouping-set level a row came from —
    // the introspection column every cube consumer needs to route
    // subtotal rows. Bit order (left col = high bit) matches both engines.
    "a15_grouping_id" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id().as("gid"),
          grouping(col("o_orderstatus")).as("g_status"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"))
  )

  val oracleSql: Map[String, String] = Map(
    "f20_map_battery" ->
      """WITH pre AS (
           SELECT l_orderkey, l_linenumber, sum(l_quantity) AS qty
           FROM lineitem GROUP BY l_orderkey, l_linenumber),
         g AS (
           SELECT l_orderkey,
             map_from_entries(list_sort(list(
               {'k': l_linenumber, 'v': qty}))) AS m
           FROM pre GROUP BY l_orderkey)
         SELECT l_orderkey,
           cardinality(m) AS n_lines,
           element_at(m, 1)[1] AS qty_ln1,
           array_to_string(map_keys(m), ',') AS lns
         FROM g ORDER BY l_orderkey""",
    "f21_conditional_agg" ->
      """WITH modes AS (
           SELECT l_returnflag, l_linenumber AS mode_ln
           FROM (SELECT l_returnflag, l_linenumber, count(*) AS c
                 FROM lineitem GROUP BY l_returnflag, l_linenumber)
           QUALIFY row_number() OVER (PARTITION BY l_returnflag
             ORDER BY c DESC, l_linenumber) = 1)
         SELECT a.l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_deep_disc,
           any_value(m.mode_ln) AS mode_ln
         FROM lineitem a JOIN modes m ON a.l_returnflag = m.l_returnflag
         GROUP BY a.l_returnflag ORDER BY a.l_returnflag""",
    "f22_histogram_bucket" ->
      """SELECT CAST(1 + ((CAST(l_quantity AS BIGINT) - 1) // 5) AS BIGINT) AS bucket,
           count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY bucket""",
    "f23_str_to_map" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS BIGINT) AS ln,
           CAST(l_suppkey AS BIGINT) AS sk,
           3 AS n_keys
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "a15_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
           GROUPING(o_orderstatus) AS g_status
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY gid, o_orderstatus, o_orderpriority"""
  )
}
