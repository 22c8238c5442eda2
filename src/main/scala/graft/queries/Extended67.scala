package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Round-7 batch 67: the arbitrary-state v2 streaming API
  * (`transformWithState`, Spark 4's replacement for the
  * mapGroupsWithState family) exercised end-to-end against the oracle.
  *
  *  - st13_stream_running_totals: per-user running (event count, spend
  *    cents) emitted after EVERY event, with the totals carried in a
  *    ValueState inside the RocksDB state store (the v2 API's required
  *    provider — set for this query, restored after). The replay runs
  *    the whole log in one micro-batch (per-file waves certify nothing
  *    here — see the registry comment; the cross-batch ValueState
  *    handoff has its own two-batch StreamingSpec fixture). The oracle
  *    restates the stream as the batch window cumulative (row_number +
  *    running cents sum) — the append-mode emission is exactly that
  *    table, row for row.
  *
  * Scale: state is 16 bytes per user key (RocksDB-backed, so state
  * size is bounded by keys, not events); each batch's work is one
  * shuffle on user_id. This is the streaming-ingest shape of e26's
  * running actives at 100 TB: the log never re-scans, only the delta
  * folds in.
  */
object Extended67 {
  type Q = (SparkSession, String) => DataFrame

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  val queries: Map[String, Q] = Map(
    // NO per-file wave cap: the processor folds each group's batch rows
    // in (event time, id) order, so the append-mode table is identical in
    // one micro-batch or two — the cross-batch ValueState handoff is
    // certified by StreamingSpec's explicit two-batch fixture, and the
    // extra wave here cost only RocksDB store commits per partition.
    "st13_stream_running_totals" -> ((s, d) => {
      val dir = Extended26.stagedTimeWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = s.readStream.schema(schema)
        .parquet(dir)
      val totals = EventStream.runningTotals(s, stream)
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, RocksDb)
      try
        Extended18.runToCompletion(s, totals, "st13_mem", OutputMode.Append())
          .orderBy("user_id", "n_so_far")
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st13_stream_running_totals" ->
      """SELECT user_id, event_id,
           CAST(row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS BIGINT) AS n_so_far,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS cents_so_far
         FROM events ORDER BY user_id, n_so_far"""
  )
}
