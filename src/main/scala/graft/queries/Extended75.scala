package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 75: Holt double-exponential smoothing (level + trend)
  * over the hourly event series — the forecasting step beyond e15's
  * single EWMA.
  *
  * e30_holt_forecast: per event type, fold the hour-ordered count
  * series through
  *
  *   l' = α·x + (1−α)·(l + b);   b' = β·(l' − l) + (1−β)·b
  *
  * with α = 0.25, β = 0.5 (both exact in binary) and init l₁ = x₁,
  * b₁ = 0, then report the final level/trend and the one-step forecast
  * l + b. The Spark side is an ordered `aggregate` fold over the
  * collected per-type series (the series is TIME-proportional — the
  * same bounded-artifact contract as a34's ACF series); the oracle runs
  * the identical recurrence as a recursive CTE. Both engines execute
  * the same IEEE sequence step for step — the l' reuse inside b' is a
  * deterministic duplicate expression on the Spark side and a bound
  * subquery column on the DuckDB side, same value either way.
  *
  * Reference context: no counterpart; completes the time-series family
  * (e15 EWMA, e17 anomaly, a34 ACF).
  */
object Extended75 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e30_holt_forecast" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      val series = hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("sr"))
      val state = aggregate(
        expr("slice(sr, 2, size(sr) - 1)"),
        struct(element_at(col("sr"), 1)("x").cast("double").as("l"),
          lit(0.0).as("b")),
        (acc, e) => {
          val x = e("x").cast("double")
          val l2 = lit(0.25) * x + lit(0.75) * (acc("l") + acc("b"))
          struct(l2.as("l"),
            (lit(0.5) * (l2 - acc("l")) + lit(0.5) * acc("b")).as("b"))
        })
      series.select(col("event_type"), size(col("sr")).cast("long").as("n_obs"),
          state.as("st"))
        .select(col("event_type"), col("n_obs"),
          col("st")("l").as("level"), col("st")("b").as("trend"),
          (col("st")("l") + col("st")("b")).as("forecast"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e30_holt_forecast" ->
      """WITH RECURSIVE hourly AS (
           SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM hourly),
         rec AS (
           SELECT event_type, 1 AS i, CAST(x AS DOUBLE) AS l,
             CAST(0 AS DOUBLE) AS b, n
           FROM idx WHERE i = 1
           UNION ALL
           SELECT s.event_type, s.i, s.l2,
             0.5 * (s.l2 - s.l) + 0.5 * s.b, s.n
           FROM (
             SELECT r.event_type, r.i + 1 AS i, r.l, r.b, r.n,
               0.25 * CAST(x.x AS DOUBLE) + 0.75 * (r.l + r.b) AS l2
             FROM rec r JOIN idx x
               ON x.event_type = r.event_type AND x.i = r.i + 1) s)
         SELECT event_type, CAST(n AS BIGINT) AS n_obs, l AS level,
           b AS trend, l + b AS forecast
         FROM rec WHERE i = n ORDER BY event_type"""
  )
}
