package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 82: two-sample location testing and calendar seasonality —
  * the last two staples of the drift/monitoring family.
  *
  *  - a39_welch_ttest: Welch's unequal-variance t-test on document length
  *    (n_chars) between the two md5-coin halves (the a28/a29/a33/a37
  *    split). The integer spine is total: per half n, Σx and Σx² are
  *    exact BIGINTs from ONE aggregate; sample variance is restated as
  *    (n·Σx² − (Σx)²) / (n·(n−1)) — integer numerator, one division —
  *    and t plus the Welch–Satterthwaite degrees of freedom are a fixed
  *    dag of IEEE ops over those exact inputs, identical in both
  *    engines. This is the A/B gate a curation change ships against.
  *  - e31_hourly_seasonality: the hour-of-day profile per event type —
  *    n, exact milli-sum of value, mean value and the hour's share of the
  *    type's events. Milli-units are exact BIGINTs (round(value·1000) — the e27/e28
  *    discipline), so the only floats are the two terminal divisions.
  *    The 24×types row count is calendar-bounded: at 100 TB it is the
  *    same ≤ a-few-hundred rows, and the single corpus scan underneath
  *    is one partial-aggregated hash agg on (type, hour).
  *
  * Scale shape: both are one scan → one hash aggregate; a39's final
  * algebra runs on a 2-row artifact, e31's on a calendar-bounded one.
  *
  * Reference context: no counterpart; completes the drift family with
  * the parametric location test (a28 KS is distribution-free; a39 is
  * the power-optimal normal-theory twin) and the event family with the
  * seasonality restatement of e1's hourly aggregate.
  */
object Extended82 {
  type Q = (SparkSession, String) => DataFrame

  private def halfA: Column =
    (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .cast("long")

  val queries: Map[String, Q] = Map(
    "a39_welch_ttest" -> ((s, d) => {
      val agg = t(s, d, "documents")
        .select(halfA.as("a"), col("n_chars").as("x"))
        .agg(
          sum("a").as("n_a"),
          sum(lit(1L) - col("a")).as("n_b"),
          sum(col("a") * col("x")).as("sum_a"),
          sum((lit(1L) - col("a")) * col("x")).as("sum_b"),
          sum(col("a") * col("x") * col("x")).as("ss_a"),
          sum((lit(1L) - col("a")) * col("x") * col("x")).as("ss_b"))
      // var = (n·Σx² − (Σx)²) / (n·(n−1)): exact integer numerator. The
      // n·Σx² product crosses 2^63 around sf1 (Σx² is Σ n_chars² — row-
      // proportional), so the exact intermediates are DECIMAL(38,0)
      // (HUGEINT in the oracle) — still exact, overflow-loud at 10^38.
      def meanOf(sm: Column, n: Column) = sm.cast("double") / n.cast("double")
      def varOf(n: Column, sm: Column, ss: Column) =
        (n.cast("decimal(38,0)") * ss - sm.cast("decimal(38,0)") * sm)
          .cast("double") / (n * (n - 1)).cast("double")
      val se2a = varOf(col("n_a"), col("sum_a"), col("ss_a")) /
        col("n_a").cast("double")
      val se2b = varOf(col("n_b"), col("sum_b"), col("ss_b")) /
        col("n_b").cast("double")
      agg.select(col("n_a"), col("n_b"), col("sum_a"), col("sum_b"),
        col("ss_a"), col("ss_b"),
        round((meanOf(col("sum_a"), col("n_a")) -
          meanOf(col("sum_b"), col("n_b"))) / sqrt(se2a + se2b), 6).as("t_stat"),
        // Welch–Satterthwaite: (se²a + se²b)² / (se²a²/(na−1) + se²b²/(nb−1))
        round((se2a + se2b) * (se2a + se2b) /
          (se2a * se2a / (col("n_a") - 1).cast("double") +
            se2b * se2b / (col("n_b") - 1).cast("double")), 6).as("dof"))
    }),

    "e31_hourly_seasonality" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
          round(col("value") * 1000).cast("long").as("mv"))
      val per = ev.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n"), sum("mv").as("mv_sum"))
      val tot = per.groupBy("event_type").agg(sum("n").as("n_type"))
      per.join(tot, "event_type")
        .select(col("event_type"), col("hod"), col("n"), col("mv_sum"),
          round(col("mv_sum").cast("double") / col("n").cast("double")
            / 1000.0, 6).as("mean_value"),
          round(col("n").cast("double") / col("n_type").cast("double"), 6)
            .as("hour_share"))
        .orderBy("event_type", "hod")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a39_welch_ttest" ->
      """WITH h AS (
           SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
             THEN 1 ELSE 0 END AS a, n_chars AS x
           FROM documents),
         agg AS (
           SELECT CAST(sum(a) AS BIGINT) AS n_a,
             CAST(sum(1 - a) AS BIGINT) AS n_b,
             CAST(sum(a * x) AS BIGINT) AS sum_a,
             CAST(sum((1 - a) * x) AS BIGINT) AS sum_b,
             CAST(sum(a * x * x) AS BIGINT) AS ss_a,
             CAST(sum((1 - a) * x * x) AS BIGINT) AS ss_b
           FROM h),
         v AS (
           SELECT *,
             CAST(CAST(n_a AS HUGEINT) * ss_a
                 - CAST(sum_a AS HUGEINT) * sum_a AS DOUBLE)
               / CAST(n_a * (n_a - 1) AS DOUBLE) / CAST(n_a AS DOUBLE) AS se2a,
             CAST(CAST(n_b AS HUGEINT) * ss_b
                 - CAST(sum_b AS HUGEINT) * sum_b AS DOUBLE)
               / CAST(n_b * (n_b - 1) AS DOUBLE) / CAST(n_b AS DOUBLE) AS se2b
           FROM agg)
         SELECT n_a, n_b, sum_a, sum_b, ss_a, ss_b,
           round((CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(se2a + se2b), 6) AS t_stat,
           round((se2a + se2b) * (se2a + se2b)
             / (se2a * se2a / CAST(n_a - 1 AS DOUBLE)
               + se2b * se2b / CAST(n_b - 1 AS DOUBLE)), 6) AS dof
         FROM v""",
    "e31_hourly_seasonality" ->
      """WITH e AS (
           SELECT event_type,
             CAST(extract(hour FROM ts) AS BIGINT) AS hod,
             CAST(round(value * 1000) AS BIGINT) AS mv
           FROM events),
         per AS (
           SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mv) AS BIGINT) AS mv_sum
           FROM e GROUP BY event_type, hod),
         tot AS (
           SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
           FROM per GROUP BY event_type)
         SELECT event_type, hod, n, mv_sum,
           round(CAST(mv_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6)
             AS mean_value,
           round(CAST(n AS DOUBLE) / CAST(n_type AS DOUBLE), 6) AS hour_share
         FROM per JOIN tot USING (event_type)
         ORDER BY event_type, hod"""
  )
}
