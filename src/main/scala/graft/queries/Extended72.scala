package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 72: exact lag-k autocorrelation of the hourly event
  * series — the time-series diagnostic (is traffic self-similar hour to
  * hour?) computed without a single float accumulation.
  *
  * a34_acf: for each event type and lag k ∈ {1, 2, 3}, the Pearson
  * autocorrelation of the hourly count series over the aligned pairs
  * (x_t, x_{t+k}):
  *
  *   r_k = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
  *
  * Hourly counts are integers; pair alignment is an equi-join of the
  * series onto itself shifted by k hours (keyed on (type, hour) — a
  * hash join over the hour-domain-sized series, broadcast-friendly at
  * any corpus size because the SERIES is time-, not event-,
  * proportional); every power sum is an exact BIGINT; one
  * sqrt-and-divide per (type, k) at the end. Gaps in the series (hours
  * with no events) simply drop those pairs — both engines share the
  * inner-join semantics.
  *
  * Reference context: no counterpart; completes the a-family
  * time-series diagnostics beside e15 (EWMA) and e17 (rate anomaly).
  */
object Extended72 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "a34_acf" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      val lags = s.range(1, 4).select(col("id").cast("int").as("k"))
      val pairs = hourly.as("a")
        .crossJoin(broadcast(lags))
        .join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.h") === col("a.h") + col("k"))
        .select(col("a.event_type").as("event_type"), col("k"),
          col("a.x").as("x"), col("b.x").as("y"))
      pairs.groupBy("event_type", "k")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("k"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
            .as("acf"))
        .orderBy("event_type", "k")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a34_acf" ->
      """WITH hourly AS (
           SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         lags AS (SELECT unnest([1, 2, 3]) AS k),
         pairs AS (
           SELECT a.event_type, lags.k, a.x AS x, b.x AS y
           FROM hourly a CROSS JOIN lags
           JOIN hourly b ON b.event_type = a.event_type
             AND b.h = a.h + lags.k),
         s AS (
           SELECT event_type, k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
           FROM pairs GROUP BY 1, 2)
         SELECT event_type, k, n,
           CAST(n * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(n * syy - sy * sy AS DOUBLE)) AS acf
         FROM s ORDER BY event_type, k"""
  )
}
