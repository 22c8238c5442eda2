package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-8 batch 120: the L² drift statistic and intermittent-demand
  * forecasting — completing the drift family (a28 KS is the sup-norm;
  * this is the integrated square) and the forecasting family (e30
  * Holt, e40 Holt–Winters; Croston 1972 is the zero-inflated case).
  *
  *  - a63_cramer_von_mises: the two-sample Cramér–von Mises statistic
  *    between the md5-coin halves of the document length distribution.
  *    The entire statistic is EXACT INTEGERS up to one terminal
  *    division: with pooled histogram counts c_x and inclusive
  *    cumulatives from ONE [[PrefixSum]] pass,
  *    T = Σ_x c_x·(n_B·cumA_x − n_A·cumB_x)² is an exact DECIMAL sum
  *    (order-free — no float fold anywhere), and
  *    ω² = T / (N²·n_A·n_B). The a28 spine with a square instead of a
  *    max.
  *  - e41_croston: Croston's method per event type over HIGH-VALUE
  *    demand days (daily cents of events with value > 100 — sparse by
  *    construction, the spare-parts shape). Demand sizes and
  *    inter-demand day gaps are exact integers; two coupled EWMAs
  *    (α = 0.25, binary-exact) fold over the day-ordered demand list
  *    (the e30 bounded-artifact contract), initialized z₁ = first
  *    demand, p₁ = 1; the demand-rate forecast is z/p — one division.
  *    The oracle replays the identical recurrence as a recursive CTE.
  *
  * Scale shape: a63 is scan → value histogram → PrefixSum → one exact
  * aggregate; e41's demand series is calendar-bounded per type. No
  * unkeyed windows, no driver loops.
  *
  * Reference context: no counterpart; extends the a-family drift layer
  * and the e-family forecasting layer.
  */
object Extended120 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** t7's engine-portable coin flip: md5 hex digit < '8' → half A. */
  private def inA: Column =
    (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .cast("long")

  val queries: Map[String, Q] = Map(
    // ---- a63: exact two-sample Cramér–von Mises ----
    "a63_cramer_von_mises" -> ((s, d) => {
      val h = t(s, d, "documents")
        .select(col("n_chars"), inA.as("a"))
        .groupBy("n_chars")
        .agg(sum("a").as("ca"), sum(lit(1L) - col("a")).as("cb"))
      val c = PrefixSum.cumSum(h, "n_chars", Seq("ca", "cb"),
        bucketWidth = 512.0)
      val cum = c.select(col("ca"), col("cb"),
        (col("pre_ca") + col("ca")).as("cuma"),
        (col("pre_cb") + col("cb")).as("cumb"))
      val tot = cum.agg(sum("ca").as("na"), sum("cb").as("nb"))
      // T = Σ c·(n_B·cumA − n_A·cumB)² — exact DECIMAL, order-free
      cum.crossJoin(broadcast(tot))
        .groupBy("na", "nb")
        .agg(sum(dec(col("ca") + col("cb")) *
          (dec(col("nb")) * dec(col("cuma")) -
            dec(col("na")) * dec(col("cumb"))) *
          (dec(col("nb")) * dec(col("cuma")) -
            dec(col("na")) * dec(col("cumb")))).as("ts"))
        .select(col("na"), col("nb"),
          round(col("ts").cast("double") /
            (dec(col("na") + col("nb")) * dec(col("na") + col("nb")) *
              dec(col("na")) * dec(col("nb"))).cast("double"), 6)
            .as("omega2"))
    }),

    // ---- e41: Croston's intermittent-demand forecast ----
    "e41_croston" -> ((s, d) => {
      val demands = t(s, d, "events")
        .filter(col("value") > 100.0)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val series = demands.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("sr"))
        .filter(size(col("sr")) >= 2)
      val state = aggregate(
        expr("slice(sr, 2, size(sr) - 1)"),
        struct(element_at(col("sr"), 1)("day").as("pd"),
          element_at(col("sr"), 1)("y").cast("double").as("z"),
          lit(1.0).as("p")),
        (acc, e) => {
          val q = (e("day") - acc("pd")).cast("double")
          val z2 = acc("z") + lit(0.25) * (e("y").cast("double") - acc("z"))
          val p2 = acc("p") + lit(0.25) * (q - acc("p"))
          struct(e("day").as("pd"), z2.as("z"), p2.as("p"))
        })
      series.select(col("event_type"),
          size(col("sr")).cast("long").as("n_demands"), state.as("st"))
        .select(col("event_type"), col("n_demands"),
          round(col("st.z"), 6).as("demand_size"),
          round(col("st.p"), 6).as("demand_interval"),
          round(col("st.z") / col("st.p"), 6).as("rate_forecast"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a63_cramer_von_mises" ->
      """WITH h AS (
           SELECT n_chars,
             CAST(sum(CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               AS BIGINT)) AS BIGINT) AS ca,
             CAST(sum(CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8'
               AS BIGINT)) AS BIGINT) AS cb
           FROM documents GROUP BY n_chars),
         cum AS (
           SELECT ca, cb,
             CAST(sum(ca) OVER (ORDER BY n_chars) AS BIGINT) AS cuma,
             CAST(sum(cb) OVER (ORDER BY n_chars) AS BIGINT) AS cumb
           FROM h),
         tot AS (
           SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb
           FROM h),
         tsum AS (
           SELECT sum(CAST(ca + cb AS HUGEINT)
             * (CAST(t.nb AS HUGEINT) * cuma - CAST(t.na AS HUGEINT) * cumb)
             * (CAST(t.nb AS HUGEINT) * cuma - CAST(t.na AS HUGEINT) * cumb))
             AS ts
           FROM cum, tot t)
         SELECT t.na, t.nb,
           round(CAST(ts.ts AS DOUBLE)
             / CAST(CAST(t.na + t.nb AS HUGEINT) * (t.na + t.nb)
               * t.na * t.nb AS DOUBLE), 6) AS omega2
         FROM tot t, tsum ts""",
    "e41_croston" ->
      """WITH RECURSIVE dm AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events WHERE value > 100 GROUP BY 1, 2),
         idxd AS (
           SELECT event_type, day, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM dm),
         eligible AS (SELECT DISTINCT event_type, n FROM idxd WHERE n >= 2),
         rec AS (
           SELECT x.event_type, e.n, 1 AS i, x.day AS pd,
             CAST(x.y AS DOUBLE) AS z, CAST(1 AS DOUBLE) AS p
           FROM idxd x JOIN eligible e USING (event_type) WHERE x.i = 1
           UNION ALL
           SELECT r.event_type, r.n, r.i + 1, x.day,
             r.z + 0.25 * (CAST(x.y AS DOUBLE) - r.z),
             r.p + 0.25 * (CAST(x.day - r.pd AS DOUBLE) - r.p)
           FROM rec r JOIN idxd x
             ON x.event_type = r.event_type AND x.i = r.i + 1)
         SELECT event_type, n AS n_demands, round(z, 6) AS demand_size,
           round(p, 6) AS demand_interval,
           round(z / p, 6) AS rate_forecast
         FROM rec WHERE i = n ORDER BY event_type"""
  )
}
