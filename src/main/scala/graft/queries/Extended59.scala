package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Round-7 surface extensions, batch 59: the stream-stream FULL OUTER
  * interval join, replayed to completion — completes the streaming
  * join-mode family under the oracle gate (st2 inner, st8 left outer,
  * st11 full outer). Wave count is load-bearing exactly as in st8: the
  * far-future sentinel pair arrives as a LATER file than the event log,
  * so both sides' unmatched state is held across micro-batches and
  * released by the watermark — the cross-batch outer-state handoff is
  * what the replay certifies. Unmatched purchases emit null-click rows,
  * unmatched clicks collapse into the (user, null-purchase) group; the
  * oracle is the batch FULL JOIN restated over the same band.
  */
object Extended59 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st11_stream_full_join" -> ((s, d) => {
      val dir = Extended30.stagedOuterDir(s, d)
      val schema = s.read.parquet(dir).schema
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      val j = EventStream.funnelFullJoin(stream)
      Extended18.runToCompletion(s, j, "st11_mem", OutputMode.Append())
        .filter(col("user_id") =!= 9999999L)
        .groupBy("user_id", "purchase_id")
        .agg(count(col("click_id")).as("n_clicks"),
          min(col("c_ts")).as("first_click"))
        .orderBy("user_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st11_stream_full_join" ->
      """WITH b AS (SELECT user_id, event_id AS purchase_id, ts AS b_ts
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
                  FROM events WHERE event_type = 'click'),
            j AS (
              SELECT coalesce(b.user_id, c.user_id) AS user_id,
                     b.purchase_id, c.click_id, c.c_ts
              FROM b FULL JOIN c
                ON b.user_id = c.user_id
                AND c.c_ts <= b.b_ts
                AND c.c_ts >= b.b_ts - INTERVAL 30 MINUTE)
         SELECT user_id, purchase_id,
           count(click_id) AS n_clicks, min(c_ts) AS first_click
         FROM j GROUP BY user_id, purchase_id
         ORDER BY user_id, purchase_id"""
  )
}
