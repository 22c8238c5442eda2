package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Selection

/** Round-7 batch 77: robust trend analysis of the hourly event series —
  * the non-parametric counterparts to the regression battery (a16 fits a
  * least-squares line; these two survive outliers and ties).
  *
  *  - a35_theil_sen: the Theil–Sen slope estimator per event type — the
  *    exact LOWER MEDIAN of all pairwise slopes (x_j − x_i)/(h_j − h_i)
  *    over the hourly count series. Every slope is one integer
  *    subtraction pair and a single double division (bit-identical on
  *    both engines); the median is selected by
  *    [[graft.operators.Selection.lowerMedian]] — the two-level bucket
  *    selection, NOT a per-group cumulative window, so the selection
  *    parallelizes across buckets even with a handful of event types.
  *  - a36_mann_kendall: the Mann–Kendall trend test per event type —
  *    S = Σ_{i<j} sign(x_j − x_i), the tie-corrected variance
  *    18·Var(S) = n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5), and the
  *    continuity-corrected normal score z. S, n and both variance terms
  *    are exact BIGINTs; z is one terminal sqrt-and-divide.
  *
  * Scale shape (the a34 argument): the HOURLY SERIES is calendar-, not
  * event-, proportional — 100 TB of events over the same year still
  * aggregates to the same few thousand (type, hour) rows, so the O(n²)
  * pair join is bounded by the time span squared, never by the corpus.
  * The pair join itself is a broadcast hash join on event_type with the
  * h-inequality as a post-filter (the series always fits in a broadcast).
  *
  * Reference context: no counterpart; completes the trend/drift family
  * beside a16 (OLS), a28 (KS), a34 (ACF) and e29 (CUSUM).
  */
object Extended77 {
  type Q = (SparkSession, String) => DataFrame

  private def hourly(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))

  val queries: Map[String, Q] = Map(
    "a35_theil_sen" -> ((s, d) => {
      val hr = hourly(s, d)
      val pairs = hr.as("a")
        .join(broadcast(hr.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.h") > col("a.h"))
        .select(col("a.event_type").as("event_type"),
          // try_divide, not `/`: downstream isnotnull(slope) filters can be
          // pushed into the join condition, where ANSI division may evaluate
          // BEFORE the h-inequality conjunct on an equal-h key match. The
          // join guarantees h_b > h_a for every surviving row, so the
          // null branch never reaches the output — it only keeps the
          // out-of-order evaluation from throwing DIVIDE_BY_ZERO.
          try_divide((col("b.x") - col("a.x")).cast("double"),
            (col("b.h") - col("a.h")).cast("double")).as("slope"))
      val hist = pairs.groupBy("event_type", "slope")
        .agg(count(lit(1)).as("n"))
      val med = Selection.lowerMedian(
        hist, Seq("event_type"), "slope", "n", "med_slope", bucketWidth = 1.0)
      val nPairs = pairs.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
      med.join(nPairs, "event_type")
        .select(col("event_type"), col("n_pairs"),
          round(col("med_slope"), 6).as("ts_slope"))
        .orderBy("event_type")
    }),

    "a36_mann_kendall" -> ((s, d) => {
      val hr = hourly(s, d)
      val sStat = hr.as("a")
        .join(broadcast(hr.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.h") > col("a.h"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s_stat"))
      val nRows = hr.groupBy("event_type").agg(count(lit(1)).as("n"))
      // tie groups over the VALUE domain (hours sharing a count)
      val ties = hr.groupBy("event_type", "x").agg(count(lit(1)).as("tk"))
        .groupBy("event_type")
        .agg(sum(col("tk") * (col("tk") - 1) * (lit(2) * col("tk") + 5))
          .as("tie_term"))
      sStat.join(nRows, "event_type").join(ties, "event_type")
        .select(col("event_type"), col("n"), col("s_stat"),
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
            col("tie_term")).as("var18"))
        .select(col("event_type"), col("n"), col("s_stat"), col("var18"),
          round(when(col("var18") <= 0 || col("s_stat") === 0, lit(0.0))
            .otherwise((col("s_stat").cast("double") -
              signum(col("s_stat").cast("double"))) /
              sqrt(col("var18").cast("double") / 18.0)), 6).as("z"))
        .orderBy("event_type")
    })
  )

  private val hourlyCte =
    """hourly AS (
         SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
           CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2)"""

  val oracleSql: Map[String, String] = Map(
    "a35_theil_sen" ->
      s"""WITH $hourlyCte,
         pairs AS (
           SELECT a.event_type,
             CAST(b.x - a.x AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
           FROM hourly a JOIN hourly b
             ON b.event_type = a.event_type AND b.h > a.h),
         ranked AS (
           SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
           FROM pairs)
         SELECT event_type, m AS n_pairs, round(slope, 6) AS ts_slope
         FROM ranked WHERE rn = (m + 1) // 2
         ORDER BY event_type""",
    "a36_mann_kendall" ->
      s"""WITH $hourlyCte,
         s AS (
           SELECT a.event_type,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
           FROM hourly a JOIN hourly b
             ON b.event_type = a.event_type AND b.h > a.h
           GROUP BY a.event_type),
         n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM hourly GROUP BY event_type),
         ties AS (
           SELECT event_type,
             CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tie_term
           FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS tk
                 FROM hourly GROUP BY event_type, x)
           GROUP BY event_type),
         v AS (
           SELECT s.event_type, n.n, s.s_stat,
             n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS var18
           FROM s JOIN n USING (event_type) JOIN ties USING (event_type))
         SELECT event_type, n, s_stat, var18,
           round(CASE WHEN var18 <= 0 OR s_stat = 0 THEN 0.0
             ELSE (CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) /
                  sqrt(CAST(var18 AS DOUBLE) / 18.0) END, 6) AS z
         FROM v ORDER BY event_type"""
  )
}
