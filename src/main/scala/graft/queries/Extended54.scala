package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 54: robust outlier detection.
  *
  *  - e27: ROBUST OUTLIERS by modified z-score — the production
  *    anomaly-detection form that survives the anomalies themselves
  *    (mean/stddev z-scores are dragged by the outliers they hunt;
  *    median/MAD are 50%-breakdown robust): flag |0.6745·(x−med)/MAD| >
  *    3.5 (Iglewicz–Hoaglin). Median and MAD come from the a22
  *    selection discipline — (type, value, n) histogram, integer
  *    cumulative selection twice, values scaled to exact milli-units —
  *    then ONE more pass over the histogram counts outliers (the z
  *    expression is the identical double tree both engines, fed by
  *    identical integers, so verdicts match bit-for-bit). State ∝
  *    distinct values per type; the raw table is scanned once.
  */
object Extended54 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e27_robust_outliers" -> ((s, d) => {
      val x = t(s, d, "events").select(col("event_type").as("et"),
        round(col("value") * 1000).cast("long").as("v"))
      val cnt = x.groupBy("et", "v").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      // two-level bucketed selection — see a22_mad / operators/Selection
      def lowerMedian(counts: DataFrame, valCol: String, outCol: String) =
        graft.operators.Selection.lowerMedianBounded(counts, Seq("et"),
          valCol, "n", outCol)
      val med = lowerMedian(cnt, "v", "medv")
      // unaggregated dev rows: the bounded selection tolerates duplicate
      // keys (bucket pass partial-aggregates, driver walk sums) — one
      // shuffle saved; see a22_mad
      val devCnt = cnt.join(broadcast(med), "et")
        .select(col("et"), abs(col("v") - col("medv")).as("dv"), col("n"))
      val mad = lowerMedian(devCnt, "dv", "madv")
      cnt.join(broadcast(med), "et").join(broadcast(mad), "et")
        .groupBy("et")
        .agg(any_value(col("medv")).as("medv"), any_value(col("madv")).as("madv"),
          sum(when(col("madv") > 0 &&
            abs(lit(0.6745) * (col("v") - col("medv")) / col("madv")) > 3.5,
            col("n")).otherwise(0L)).as("n_outliers"),
          sum("n").as("n"))
        .select(col("et").as("event_type"),
          round(col("medv").cast("double") / 1000.0, 3).as("median_value"),
          round(col("madv").cast("double") / 1000.0, 3).as("mad_value"),
          col("n_outliers"), col("n"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e27_robust_outliers" ->
      """WITH x AS (SELECT event_type AS et,
                  CAST(round(value * 1000) AS BIGINT) AS v
           FROM events),
         cnt AS (SELECT et, v, count(*) AS n FROM x GROUP BY 1, 2),
         med AS (
           SELECT et, min(v) AS medv FROM (
             SELECT et, v, sum(n) OVER (PARTITION BY et ORDER BY v) AS cw,
               sum(n) OVER (PARTITION BY et) AS tw
             FROM cnt) WHERE 2 * cw >= tw GROUP BY et),
         dev AS (
           SELECT c.et, abs(c.v - m.medv) AS dv, c.n
           FROM cnt c JOIN med m ON c.et = m.et),
         dcnt AS (SELECT et, dv, CAST(sum(n) AS BIGINT) AS n FROM dev
                  GROUP BY 1, 2),
         mad AS (
           SELECT et, min(dv) AS madv FROM (
             SELECT et, dv, sum(n) OVER (PARTITION BY et ORDER BY dv) AS cw,
               sum(n) OVER (PARTITION BY et) AS tw
             FROM dcnt) WHERE 2 * cw >= tw GROUP BY et)
         SELECT x.et AS event_type,
           round(CAST(any_value(m.medv) AS DOUBLE) / 1000.0, 3) AS median_value,
           round(CAST(any_value(d.madv) AS DOUBLE) / 1000.0, 3) AS mad_value,
           CAST(count(*) FILTER (
             WHERE d.madv > 0 AND
               abs(0.6745 * (x.v - m.medv) / d.madv) > 3.5) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
         FROM x JOIN med m ON x.et = m.et JOIN mad d ON x.et = d.et
         GROUP BY x.et ORDER BY x.et"""
  )
}
