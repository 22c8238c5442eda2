package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 8: explicit null-ordering sorts and
  * FILTER-clause / HAVING aggregates — the last uncovered corners of the
  * relational surface. Both with DuckDB oracles.
  */
object Extended8 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- sort battery: mixed directions with explicit null placement ----
    // nulls manufactured deterministically (zero discounts), then every
    // combination: asc_nulls_first / asc_nulls_last / desc_nulls_first.
    "f15_sort_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("d_null"),
          col("l_quantity"))
        .orderBy(col("d_null").asc_nulls_first, col("l_quantity").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(2000)),

    // ---- FILTER-clause aggregates + HAVING over grouped distinct ----
    "q7_filtered_agg" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag,
          count(*) AS n,
          count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          count(DISTINCT l_suppkey) AS n_supp,
          CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
        FROM v_lineitem
        GROUP BY l_returnflag
        HAVING count(DISTINCT l_suppkey) > 1
        ORDER BY l_returnflag""")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f15_sort_battery" ->
      """SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS d_null, l_quantity
         FROM lineitem
         ORDER BY d_null ASC NULLS FIRST, l_quantity DESC,
           l_orderkey ASC, l_linenumber ASC
         LIMIT 2000""",
    "q7_filtered_agg" ->
      """SELECT l_returnflag,
           count(*) AS n,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
         FROM lineitem
         GROUP BY l_returnflag
         HAVING count(DISTINCT l_suppkey) > 1
         ORDER BY l_returnflag"""
  )
}
