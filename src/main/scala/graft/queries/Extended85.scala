package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Round-7 batch 85: streaming point-in-time (as-of) enrichment — the
  * missing temporal-join mode in the streaming family (st8/st11 cover
  * interval outer joins; this is the feature-store lookup: "decorate the
  * fact with the dimension AS OF its event time").
  *
  *  - st14_stream_asof_enrich: [[EventStream.asOfEnrich]] replayed to
  *    completion over the time-split waves: every purchase is enriched
  *    with the latest PRECEDING view's (event-time, exact milli-value)
  *    per user, "preceding" in the (ts, event_id) total order; no prior
  *    view → null columns (LEFT as-of). Cross-batch correctness is the
  *    load-bearing part — views in wave k must satisfy purchases in wave
  *    k+1 through ONE state row per user (never buffered history) — a
  *    handoff StreamingSpec certifies with an explicit two-batch fixture,
  *    while this sweep query replays the whole log in one batch under the
  *    batch IGNORE-NULLS window oracle row-for-row. Milli-values are
  *    exact BIGINTs, so no float enters the parity surface.
  *
  * Scale shape: state is O(distinct users) × one row; each micro-batch
  * sorts only its own per-group slice. The oracle's window is the
  * restatement, not the plan — batch e21 does the same lookup with a
  * point-in-time join.
  *
  * Reference context: no counterpart; completes the streaming join
  * family (st8 left interval, st10 stream-static equi, st11 full
  * interval, st14 as-of).
  */
object Extended85 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // NO per-file wave cap: each batch sorts its group rows by (event
    // time, id) before replaying the state machine, so one micro-batch
    // and two produce the same enriched rows — the views-in-wave-k →
    // purchases-in-wave-k+1 handoff is certified by StreamingSpec's
    // explicit two-batch fixture, where the wave schedule is cheap.
    "st14_stream_asof_enrich" -> ((s, d) => {
      val dir = Extended26.stagedTimeWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = s.readStream.schema(schema)
        .parquet(dir)
      val enriched = EventStream.asOfEnrich(s, stream)
      Extended18.runToCompletion(s, enriched, "st14_mem", OutputMode.Append())
        .orderBy("user_id", "event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st14_stream_asof_enrich" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
             event_type, CAST(round(value * 1000) AS BIGINT) AS mv
           FROM events
           WHERE event_type IN ('view', 'purchase')),
         w AS (
           SELECT user_id, event_id, us, event_type,
             last_value(CASE WHEN event_type = 'view' THEN us END
               IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_us,
             last_value(CASE WHEN event_type = 'view' THEN mv END
               IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_mv
           FROM e)
         SELECT user_id, event_id, us AS p_us, view_us, view_mv
         FROM w WHERE event_type = 'purchase'
         ORDER BY user_id, event_id"""
  )
}
