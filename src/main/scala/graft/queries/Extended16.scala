package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-3 surface extensions, batch 16: threshold anomaly detection over
  * per-entity rates, and schema-evolution union (the S5 dynamic-column
  * semantics as a query-able operator).
  */
object Extended16 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- rate anomalies: hours where a user's event count exceeds that
    // user's mean + 3σ ----
    // Variance from exact integer power sums (population form, one
    // terminal division — the a16/a17 determinism pattern), broadcast
    // back onto the per-hour counts. Two partial-aggregable shuffles;
    // no window over the fact table.
    "e17_rate_anomaly" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy("user_id")
        .agg(count(lit(1)).as("h"), sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
        .select(col("user_id"),
          (col("s1").cast("double") / col("h")).as("mu"),
          sqrt(col("s2").cast("double") / col("h") -
            (col("s1").cast("double") / col("h")) *
            (col("s1").cast("double") / col("h"))).as("sigma"))
      hourly.join(broadcast(stats), "user_id")
        .filter(col("n") > col("mu") + lit(3.0) * col("sigma"))
        .select(col("user_id"), unix_timestamp(col("hour")).as("hour_ts"),
          col("n"), round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"))
        .orderBy("user_id", "hour_ts")
    }),

    // ---- schema-evolution union: unionByName(allowMissingColumns) ----
    // The reference's incremental ALTER TABLE ingest (SURVEY §1.3/S5) as a
    // first-class operator: two sources with divergent column sets merge
    // into the superset schema, absent columns null-filled — no
    // coordination, no rewrite of either input.
    "u4_schema_evolution" -> ((s, d) => {
      val old = t(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_quantity"))
      val newer = t(s, d, "lineitem").filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
      old.unionByName(newer, allowMissingColumns = true)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("qty"),
          count(col("l_discount")).as("n_disc"))
        .orderBy("l_orderkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e17_rate_anomaly" ->
      """WITH hourly AS (
           SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT user_id,
             CAST(sum(n) AS DOUBLE) / count(*) AS mu,
             sqrt(CAST(sum(n * n) AS DOUBLE) / count(*) -
               (CAST(sum(n) AS DOUBLE) / count(*)) *
               (CAST(sum(n) AS DOUBLE) / count(*))) AS sigma
           FROM hourly GROUP BY user_id)
         SELECT h.user_id, CAST(epoch(h.hour) AS BIGINT) AS hour_ts, h.n,
           round(s.mu, 6) AS mu, round(s.sigma, 6) AS sigma
         FROM hourly h JOIN stats s ON h.user_id = s.user_id
         WHERE h.n > s.mu + 3.0 * s.sigma
         ORDER BY h.user_id, hour_ts""",
    "u4_schema_evolution" ->
      """WITH u AS (
           SELECT l_orderkey, l_quantity, NULL AS l_discount
           FROM lineitem WHERE l_linenumber = 1
           UNION ALL
           SELECT l_orderkey, l_quantity, l_discount
           FROM lineitem WHERE l_linenumber = 2)
         SELECT l_orderkey, count(*) AS n,
           round(sum(l_quantity), 2) AS qty,
           count(l_discount) AS n_disc
         FROM u GROUP BY l_orderkey ORDER BY l_orderkey"""
  )
}
