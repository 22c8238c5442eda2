package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Event-stream operators expressed over the batch `events` table. The
  * same plans run under Structured Streaming (see graft.streaming and
  * StreamingSpec); the batch form is what the DuckDB oracle can check.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private val SessionGapSec = 1800L

  val queries: Map[String, Q] = Map(
    // gap-based sessionization: a >30 min silence starts a new session.
    // unix-seconds (floored) on both sides for engine parity.
    "e2_sessionize" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
      val wOrd = Window.partitionBy("user_id").orderBy("sec", "event_id")
      ev.withColumn("gap", col("sec") - lag("sec", 1).over(wOrd))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > SessionGapSec, 1).otherwise(0))
        .withColumn("session_id",
          sum("new_session").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .select("user_id", "event_id", "session_id")
        .orderBy("user_id", "event_id")
    }),
    // as-of join (backward): latest signup at-or-before each event, per
    // user. Expressed as a running max over the ordered stream — the
    // shuffle-free form of an as-of self-join.
    "e3_asof_last_signup" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("last_signup",
          max(when(col("event_type") === "signup", col("sec"))).over(w))
        .select("user_id", "event_id", "last_signup")
        .orderBy("user_id", "event_id")
    }),
    // hopping-window aggregate (1 h window, 30 min slide) — the batch form
    // of the Structured Streaming sliding window; every event lands in
    // exactly two windows.
    "e5_sliding_agg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type")),
    // JSON property extraction from the semi-structured props column
    "e6_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id")),
    // per-session aggregate fused into the sessionize pass: `value` rides
    // through the window shuffle, and hash(user_id) already co-locates the
    // (user_id, session_id) grouping keys, so the whole query is one
    // shuffle + map-side aggregation — no re-sessionize, no join (the
    // previous join-on-event_id shape cost two extra shuffles and a second
    // scan).
    "e4_session_stats" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("sec"))
      val wOrd = Window.partitionBy("user_id").orderBy("sec", "event_id")
      ev.withColumn("gap", col("sec") - lag("sec", 1).over(wOrd))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > SessionGapSec, 1).otherwise(0))
        .withColumn("session_id",
          sum("new_session").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .orderBy("user_id", "session_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e2_sessionize" ->
      s"""WITH ev AS (
           SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id, event_id, sec,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
           FROM ev)
         SELECT user_id, event_id,
           CAST(sum(CASE WHEN gap IS NULL OR gap > $SessionGapSec THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         FROM g ORDER BY user_id, event_id""",
    "e3_asof_last_signup" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events)
         SELECT user_id, event_id,
           max(CASE WHEN event_type = 'signup' THEN sec END)
             OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
         FROM ev ORDER BY user_id, event_id""",
    "e5_sliding_agg" ->
      """WITH w AS (
           SELECT event_type, value,
             CAST(floor(floor(epoch(ts)) / 1800) * 1800 AS BIGINT) AS s30
           FROM events),
         x AS (
           SELECT event_type, value, unnest([s30, s30 - 1800]) AS win_start FROM w)
         SELECT win_start, event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM x GROUP BY win_start, event_type ORDER BY win_start, event_type""",
    "e6_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
         FROM events ORDER BY event_id""",
    "e4_session_stats" ->
      s"""WITH ev AS (
           SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id, event_id, value, sec,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
           FROM ev),
         sess AS (
           SELECT user_id, event_id, value,
             CAST(sum(CASE WHEN gap IS NULL OR gap > $SessionGapSec THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"""
  )
}
