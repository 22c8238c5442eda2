package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 52: run-length streaks and rolling
  * active users.
  *
  *  - w11: LONGEST PER-USER STREAK — classic run-length encoding by the
  *    gaps-and-islands rank difference (`rn − rank-within-type` is
  *    constant exactly along a run): every window partitions by user (or
  *    user × type), so the work is key-local end to end; ties between
  *    equally long streaks break to the lexicographically smallest event
  *    type. The total order inside a user is (ts, event_id) — event_id
  *    is unique, so run boundaries are deterministic under duplicate
  *    timestamps on BOTH engines.
  *  - e26: DAU / WAU / STICKINESS — rolling 7-day distinct actives. The
  *    raw event table reduces FIRST to the distinct (day, user) relation
  *    (one dedup shuffle, the biggest step); the rolling distinct then
  *    joins that small relation against the tiny day dimension with a
  *    6-day band (days broadcast), because count-DISTINCT-over-range
  *    windows don't compose — the band join over the deduped relation is
  *    the standard exact formulation, |days| × avg-active rows. DAU/WAU
  *    stickiness is one terminal division.
  */
object Extended52 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- w11: longest same-type streak per user ----
    "w11_longest_streak" -> ((s, d) => {
      val e = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), col("ts"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
      val runs = e.withColumn("grp", col("rn") - row_number().over(
        Window.partitionBy("user_id", "event_type").orderBy("rn")))
      val len = runs.groupBy("user_id", "event_type", "grp")
        .agg(count(lit(1)).as("streak"))
      val ms = len.withColumn("ms",
        max("streak").over(Window.partitionBy("user_id")))
      ms.groupBy("user_id")
        .agg(max("streak").as("max_streak"),
          min(when(col("streak") === col("ms"), col("event_type")))
            .as("top_type"))
        .orderBy("user_id")
    }),

    // ---- e26: DAU / WAU / stickiness over the deduped day-user relation ----
    "e26_active_users" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
        .distinct()
        .localCheckpoint()
      val days = du.select("day").distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = broadcast(days.select(col("day").as("d")))
        .join(du, col("day").between(col("d") - 6, col("d")))
        .groupBy(col("d").as("day"))
        .agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
        .orderBy("day")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "w11_longest_streak" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         runs AS (
           SELECT user_id, event_type,
             rn - row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY rn) AS grp
           FROM e),
         len AS (
           SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS streak
           FROM runs GROUP BY user_id, event_type, grp)
         SELECT user_id, CAST(max(streak) AS BIGINT) AS max_streak,
           min(event_type) FILTER (WHERE streak = ms) AS top_type
         FROM (SELECT *, max(streak) OVER (PARTITION BY user_id) AS ms FROM len)
         GROUP BY user_id ORDER BY user_id""",
    "e26_active_users" ->
      """WITH du AS (
           SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             user_id
           FROM events),
         days AS (SELECT DISTINCT day FROM du),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day),
         wau AS (
           SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
           FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
           GROUP BY d.day)
         SELECT d.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
         FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
         ORDER BY d.day"""
  )
}
