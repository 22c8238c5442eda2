package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Round-6 surface extensions, batch 35: the streaming twin of the
  * transition matrix — per-user lag() re-expressed as
  * flatMapGroupsWithState (the last event chains through state between
  * micro-batches — a handoff StreamingSpec certifies with an explicit
  * two-batch fixture; the sweep replay runs one micro-batch). Final
  * aggregation over the emitted pairs reproduces
  * `e22_transition_matrix`'s counts and shares exactly, under the same
  * oracle SQL.
  */
object Extended35 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // NO per-file wave cap: the state fold sorts each group's batch rows
    // by (event time, id), so the emitted pair multiset is identical in
    // one micro-batch or two — last-event handoff across batches is
    // certified by StreamingSpec's explicit two-batch fixture, and the
    // wave cost here was pure state-store commit overhead.
    "st9_stream_transition" -> ((s, d) => {
      val dir = Extended26.stagedTimeWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .parquet(dir))
      val pairs = EventStream.transitionPairs(s, stream)
      val mem = Extended18.runToCompletion(s, pairs, "st9_mem",
        OutputMode.Append())
      // totals via a per-prev window over the |types|² count rows — a
      // self-join on the memory sink would conflict on attribute ids
      // (the st5 gotcha), and the window input is tiny by construction
      val w = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
      mem.groupBy("prev_type", "cur_type")
        .agg(count(lit(1)).as("n"))
        .select(col("prev_type"), col("cur_type"), col("n"),
          round(col("n").cast("double") / sum("n").over(w), 6).as("share"))
        .orderBy("prev_type", "cur_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // identical restatement to e22: the streaming replay must reproduce
    // the batch lag() pair multiset exactly
    "st9_stream_transition" ->
      """WITH pairs AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
           FROM events),
         c AS (
           SELECT prev_type, event_type AS cur_type, count(*) AS n
           FROM pairs WHERE prev_type IS NOT NULL
           GROUP BY prev_type, event_type),
         t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
               FROM c GROUP BY prev_type)
         SELECT prev_type, cur_type, n,
           round(CAST(n AS DOUBLE) / tot, 6) AS share
         FROM c JOIN t USING (prev_type)
         ORDER BY prev_type, cur_type"""
  )
}
