package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 98: randomness testing and CDC time travel.
  *
  *  - a47_runs_test: the Wald–Wolfowitz runs test on the daily
  *    cent-volume direction sequence per event type — R = 1 + number of
  *    sign changes among the non-zero day-over-day moves, compared to
  *    its null mean μ = 2·n₊·n₋/n + 1 and variance
  *    σ² = (μ−1)(μ−2)/(n−1). R, n₊, n₋ are exact integers from two
  *    type-keyed lag windows; z = (R−μ)/σ is a fixed IEEE dag over
  *    them. Completes the monitoring family beside a36 (trend), a45
  *    (change point) and e29 (CUSUM): trend tests miss oscillation,
  *    runs tests exist exactly to catch it.
  *  - u10_cdc_asof: TIME TRAVEL over u8's ordered change feed — the
  *    state of the keyed table AS OF a cutoff (the log's time midpoint,
  *    an exact integer both engines derive): last op per key at
  *    seq ≤ T, deletes drop the key. Same one-keyed-window
  *    compaction shape as u8 with the cutoff pushed into the scan
  *    (PushedFilters carries `seq <= T`, so at 100 TB the snapshot
  *    reads only log segments below the cutoff).
  *
  * Scale shapes: a47's windows are type-keyed over calendar-bounded
  * daily rows; u10 is a filtered scan + per-key row_number window
  * (parallel across keys), identical to u8's compaction plan.
  *
  * Reference context: no counterpart; extends the a- (monitoring) and
  * u- (table-maintenance) layers.
  */
object Extended98 {
  type Q = (SparkSession, String) => DataFrame


  val queries: Map[String, Q] = Map(
    // ---- a47: Wald–Wolfowitz runs test on daily direction ----
    "a47_runs_test" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val byType = Window.partitionBy("event_type").orderBy("day")
      val moves = dy
        .withColumn("mv", signum((col("y") - lag("y", 1).over(byType)).cast("double")).cast("long"))
        .filter(col("mv").isNotNull && col("mv") =!= 0)
      // runs = 1 + sign changes across the SURVIVING moves, in day order
      val runs = moves
        .withColumn("chg",
          when(lag("mv", 1).over(byType).isNull, 0L)
            .when(lag("mv", 1).over(byType) =!= col("mv"), 1L).otherwise(0L))
        .groupBy("event_type")
        .agg((sum("chg") + 1L).as("r"),
          sum(when(col("mv") === 1, 1L).otherwise(0L)).as("np"),
          sum(when(col("mv") === -1, 1L).otherwise(0L)).as("nn"))
      runs
        .withColumn("n", col("np") + col("nn"))
        .withColumn("mu",
          lit(2.0) * (col("np") * col("nn")).cast("double") / col("n").cast("double") + lit(1.0))
        .withColumn("z",
          (col("r").cast("double") - col("mu")) /
            sqrt((col("mu") - 1.0) * (col("mu") - 2.0) / (col("n") - 1).cast("double")))
        .select(col("event_type"), col("r").as("runs"), col("np"), col("nn"),
          round(col("z"), 6).as("z"))
        .orderBy("event_type")
    }),

    // ---- u10: CDC snapshot as of the log midpoint ----
    // the cutoff is the integer midpoint of the log's time span — a pure
    // function of the data (exact integer arithmetic, identical in the
    // oracle), so the snapshot genuinely differs from the final state at
    // every scale factor; a production caller passes a wall-clock T and
    // the `seq <= T` filter pushes into the scan the same way
    "u10_cdc_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val b = ev.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).head
      val cutoff = (b.getLong(0) + b.getLong(1)) / 2
      val ops = ev
        .select(
          col("user_id").as("key"),
          unix_micros(col("ts")).as("seq"),
          col("event_id"),
          when(substring(md5(col("event_id").cast("string").cast("binary")),
            1, 1).isin("0", "1"), "D").otherwise("U").as("op"),
          round(col("value") * 100).cast("long").as("cents"))
        .filter(col("seq") <= cutoff)
      val w = Window.partitionBy("key")
        .orderBy(col("seq").desc, col("event_id").desc)
      ops.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("key"), col("seq").as("last_seq"),
          col("event_id").as("last_event"), col("cents"))
        .orderBy("key")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a47_runs_test" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         mv AS (
           SELECT event_type, day,
             CAST(sign(y - lag(y) OVER (PARTITION BY event_type ORDER BY day))
               AS BIGINT) AS mv
           FROM dy),
         nz AS (SELECT * FROM mv WHERE mv IS NOT NULL AND mv <> 0),
         chg AS (
           SELECT event_type, mv,
             CASE WHEN lag(mv) OVER (PARTITION BY event_type ORDER BY day)
                    IS NULL THEN 0
                  WHEN lag(mv) OVER (PARTITION BY event_type ORDER BY day)
                    <> mv THEN 1 ELSE 0 END AS c
           FROM nz),
         agg AS (
           SELECT event_type, CAST(sum(c) + 1 AS BIGINT) AS r,
             CAST(count(*) FILTER (WHERE mv = 1) AS BIGINT) AS np,
             CAST(count(*) FILTER (WHERE mv = -1) AS BIGINT) AS nn
           FROM chg GROUP BY 1)
         SELECT event_type, r AS runs, np, nn,
           round((CAST(r AS DOUBLE)
             - (2.0 * CAST(np * nn AS DOUBLE) / CAST(np + nn AS DOUBLE) + 1.0))
             / sqrt((2.0 * CAST(np * nn AS DOUBLE) / CAST(np + nn AS DOUBLE) + 1.0 - 1.0)
               * (2.0 * CAST(np * nn AS DOUBLE) / CAST(np + nn AS DOUBLE) + 1.0 - 2.0)
               / CAST(np + nn - 1 AS DOUBLE)), 6) AS z
         FROM agg ORDER BY event_type""",
    "u10_cdc_asof" ->
      """WITH ops AS (
           SELECT user_id AS key, epoch_us(ts) AS seq, event_id,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                    IN ('0', '1') THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events
           WHERE epoch_us(ts) <= (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                                  FROM events)),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY key
             ORDER BY seq DESC, event_id DESC) AS rn
           FROM ops)
         SELECT key, seq AS last_seq, event_id AS last_event, cents
         FROM ranked WHERE rn = 1 AND op <> 'D'
         ORDER BY key"""
  )
}
