package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-8 batch 109: the portmanteau whiteness test and the k-sample
  * rank test — the two generalizations that close the testing family
  * (a51 DW tests lag 1; a55 tests lags 1..h jointly. a48 compares two
  * groups; a56 compares all of them at once).
  *
  *  - a55_ljung_box: the Ljung–Box Q statistic over the first 7
  *    autocorrelations of the per-type daily cent-volume series. The
  *    exact spine: deviations are scaled integers d_t = n·y_t − Σy, so
  *    every autocovariance numerator Σ d_t·d_{t−k} and the denominator
  *    Σ d_t² = n·(n·Σy² − (Σy)²) are exact (DECIMAL/HUGEINT —
  *    overflow-loud); each ρ̂_k is ONE division, and
  *    Q = n(n+2)·Σ_k ρ̂²_k/(n−k) folds the 7 lags in k order. The lag
  *    products come from one type-keyed band self-join
  *    (idx − 7 ≤ idx' < idx), never a window.
  *  - a56_kruskal_wallis: the Kruskal–Wallis H test across ALL event
  *    types' cent values, tie-corrected. The a48 spine generalized:
  *    one pooled cent histogram with per-type counts, one [[PrefixSum]]
  *    pass for the mass strictly below each value, 2·R_g = Σ_v
  *    c_g(v)·(2·below+ties+1) exactly per group, and
  *    H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1) over the (few) groups
  *    folded in type order, divided by the tie correction
  *    1 − Σ(t³−t)/(N³−N).
  *
  * Scale shape: a55 is calendar-bounded after one hash aggregate, and
  * the band join fans out ≤ h rows per day; a56 is one scan → value-
  * domain histogram → PrefixSum → group-bounded algebra. No unkeyed
  * windows, no driver loops.
  *
  * Reference context: no counterpart; completes the a-family testing
  * layer (a28 KS, a39 Welch, a48 rank-sum, a51 DW).
  */
object Extended109 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  val queries: Map[String, Q] = Map(
    // ---- a55: Ljung–Box whiteness over 7 lags ----
    "a55_ljung_box" -> ((s, d) => {
      val h = 7
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
        .withColumn("idx", row_number()
          .over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      val stats = dy.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      // d_t = n·y_t − Σy (exact); denominator Σd² = n·(n·Σy² − (Σy)²)
      val dev = dy.join(stats, "event_type")
        .select(col("event_type"), col("idx"),
          (dec(col("n")) * dec(col("y")) - col("sy")).as("dv"))
      // band self-join keyed by type: every (t, t−k) pair for k ∈ [1, h]
      val prods = dev.as("a").join(dev.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.idx") >= col("a.idx") - h && col("b.idx") < col("a.idx"))
        .select(col("a.event_type").as("event_type"),
          (col("a.idx") - col("b.idx")).as("k"),
          (col("a.dv") * col("b.dv")).as("p"))
        .groupBy("event_type", "k").agg(sum("p").as("ck"))
      val denom = stats.select(col("event_type"), col("n"),
        (dec(col("n")) * (dec(col("n")) * col("syy") - col("sy") * col("sy")))
          .as("c0"))
      prods.join(denom, "event_type")
        .withColumn("rho", col("ck").cast("double") / col("c0").cast("double"))
        .groupBy(col("event_type"), col("n"))
        .agg(sort_array(collect_list(struct(col("k"), col("rho")))).as("arr"))
        .select(col("event_type"), col("n").as("n_days"),
          round(element_at(col("arr"), 1)("rho"), 6).as("rho1"),
          // Q = n(n+2)·Σ_k ρ²_k/(n−k), folded in k order
          round((col("n") * (col("n") + 2)).cast("double") *
            aggregate(col("arr"), lit(0.0),
              (acc, e) => acc + e("rho") * e("rho") /
                (col("n") - e("k")).cast("double")), 6).as("q_stat"))
        .orderBy("event_type")
    }),

    // ---- a56: Kruskal–Wallis H across all event types ----
    "a56_kruskal_wallis" -> ((s, d) => {
      val r = t(s, d, "events")
        .select(col("event_type"), round(col("value") * 100).cast("long").as("x"))
      val hist = r.groupBy("event_type", "x").agg(count(lit(1)).as("cg"))
      val pooled = hist.groupBy("x").agg(sum("cg").as("c"))
      val cum = PrefixSum.cumSum(pooled, "x", Seq("c"), bucketWidth = 1024.0)
      // 2·R_g = Σ_v c_g·(2·below + ties + 1) — exact per group
      val rg = hist.join(cum.select(col("x"), col("pre_c"), col("c")), "x")
        .groupBy("event_type").agg(
          sum("cg").as("ng"),
          sum(dec(col("cg")) * (lit(2L) * dec(col("pre_c")) + dec(col("c"))
            + lit(1L))).as("two_rg"))
      val ties = cum.agg(
        sum(dec(col("c")) * dec(col("c")) * dec(col("c")) - dec(col("c")))
          .as("tie_term"), sum("c").as("nn"))
      // Σ_g R²_g/n_g folded in type order; R² = (2R)²/4
      val folded = rg.crossJoin(broadcast(ties))
        .groupBy("nn", "tie_term")
        .agg(count(lit(1)).as("k_groups"),
          sort_array(collect_list(struct(col("event_type"), col("ng"),
            col("two_rg")))).as("arr"))
        .select(col("nn"), col("tie_term"), col("k_groups"),
          aggregate(col("arr"), lit(0.0),
            (acc, g) => acc +
              (g("two_rg") * g("two_rg")).cast("double") / lit(4.0) /
                g("ng").cast("double")).as("srn"))
      folded.select(col("nn").as("n"), col("k_groups"),
          { val hRaw = lit(12.0) / (col("nn") * (col("nn") + 1)).cast("double") *
              col("srn") - lit(3.0) * (col("nn") + 1).cast("double")
            val corr = lit(1.0) - col("tie_term").cast("double") /
              (dec(col("nn")) * dec(col("nn")) * dec(col("nn")) - dec(col("nn")))
                .cast("double")
            round(hRaw / corr, 6).as("h_stat") })
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a55_ljung_box" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idxd AS (
           SELECT event_type, y, CAST(row_number() OVER (
             PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx
           FROM dy),
         stats AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM idxd GROUP BY event_type),
         dev AS (
           SELECT i.event_type, i.idx, s.n * CAST(i.y AS HUGEINT) - s.sy AS dv
           FROM idxd i JOIN stats s ON i.event_type = s.event_type),
         prods AS (
           SELECT a.event_type, a.idx - b.idx AS k, sum(a.dv * b.dv) AS ck
           FROM dev a JOIN dev b ON a.event_type = b.event_type
             AND b.idx >= a.idx - 7 AND b.idx < a.idx
           GROUP BY a.event_type, a.idx - b.idx),
         denom AS (
           SELECT event_type, n, n * (n * syy - sy * sy) AS c0 FROM stats),
         rho AS (
           SELECT p.event_type, d.n, p.k,
             CAST(p.ck AS DOUBLE) / CAST(d.c0 AS DOUBLE) AS rho
           FROM prods p JOIN denom d ON p.event_type = d.event_type)
         SELECT event_type, n AS n_days,
           round(min(CASE WHEN k = 1 THEN rho END), 6) AS rho1,
           round(CAST(n * (n + 2) AS DOUBLE)
             * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(rho * rho / CAST(n - k AS DOUBLE) ORDER BY k)),
               (a, b) -> a + b), 6) AS q_stat
         FROM rho GROUP BY event_type, n ORDER BY event_type""",
    "a56_kruskal_wallis" ->
      """WITH r AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
           FROM events),
         hist AS (
           SELECT event_type, x, CAST(count(*) AS BIGINT) AS cg
           FROM r GROUP BY 1, 2),
         pooled AS (SELECT x, CAST(sum(cg) AS BIGINT) AS c
                    FROM hist GROUP BY x),
         cum AS (
           SELECT *, CAST(coalesce(sum(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS below
           FROM pooled),
         rg AS (
           SELECT h.event_type, CAST(sum(h.cg) AS BIGINT) AS ng,
             sum(CAST(h.cg AS HUGEINT)
               * (2 * CAST(cum.below AS HUGEINT) + cum.c + 1)) AS two_rg
           FROM hist h JOIN cum ON h.x = cum.x
           GROUP BY h.event_type),
         ties AS (
           SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS tie_term,
             CAST(sum(c) AS BIGINT) AS nn
           FROM cum),
         folded AS (
           SELECT nn, tie_term, CAST(count(*) AS BIGINT) AS k_groups,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(two_rg * two_rg AS DOUBLE) / 4.0
                 / CAST(ng AS DOUBLE) ORDER BY event_type)),
               (a, b) -> a + b) AS srn
           FROM rg CROSS JOIN ties GROUP BY nn, tie_term)
         SELECT nn AS n, k_groups,
           round((12.0 / CAST(nn * (nn + 1) AS DOUBLE) * srn
               - 3.0 * CAST(nn + 1 AS DOUBLE))
             / (1.0 - CAST(tie_term AS DOUBLE)
               / CAST(CAST(nn AS HUGEINT) * nn * nn - nn AS DOUBLE)), 6)
             AS h_stat
         FROM folded"""
  )
}
