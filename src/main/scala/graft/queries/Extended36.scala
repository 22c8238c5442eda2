package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.AsOfJoin

/** Round-6 surface extensions, batch 36: the FORWARD as-of join —
  * "earliest matching row at or after" — completing the as-of family
  * (backward landed in round 2, `e3_asof_last_signup`). Same
  * union + ordered-window plan, scanned ts-descending: shuffle volume
  * |L|+|R| on the key, never an interval product.
  *
  * e23: for each purchase, the user's NEXT click at or after it, with
  * the gap in seconds — the "time to next touch" question. Clicks are
  * deduplicated per (user, ts) to the min event_id first, so the as-of
  * pick is tie-free and the LATERAL oracle restates it exactly (the e18
  * discipline).
  */
object Extended36 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e23_next_click" -> ((s, d) => {
      val ev = t(s, d, "events")
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("click_id"))
        .withColumn("c_ts", col("ts"))
      AsOfJoin.forward(buys, clicks, Seq("user_id"), "ts",
          rightCols = Seq("click_id", "c_ts"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          // exact integer µs → floor seconds (gap is non-negative, so
          // floor div agrees with DuckDB's // on every row)
          expr("(unix_micros(c_ts) - unix_micros(ts)) div 1000000")
            .as("gap_sec"))
        .orderBy("user_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e23_next_click" ->
      """WITH b AS (
           SELECT user_id, ts, event_id AS purchase_id FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, ts, min(event_id) AS click_id FROM events
           WHERE event_type = 'click' GROUP BY user_id, ts)
         SELECT b.user_id, b.purchase_id, nc.click_id,
           CAST(epoch_us(nc.c_ts - b.ts) // 1000000 AS BIGINT) AS gap_sec
         FROM b LEFT JOIN LATERAL (
           SELECT c.click_id, c.ts AS c_ts FROM c
           WHERE c.user_id = b.user_id AND c.ts >= b.ts
           ORDER BY c.ts LIMIT 1) nc ON true
         ORDER BY b.user_id, b.purchase_id"""
  )
}
