package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 95: ordered funnel conversion, value deciles through the
  * bounded selection, and lexical diversity.
  *
  *  - e36_funnel_conversion: the strict-SEQUENCE three-step funnel
  *    (view → click within 7 days → purchase within 7 days, per user) —
  *    distinct from e10's pairwise interval join: each stage must follow
  *    the PREVIOUS stage's first occurrence within the stage window, the
  *    product-analytics definition of an ordered funnel (the window is
  *    what makes it discriminate — unwindowed, a year-long log converts
  *    every user). Stage thresholds chain through
  *    two user-keyed joins (first-view table → qualifying first click →
  *    qualifying first purchase); per-stage user counts are exact and
  *    each conversion rate is one terminal division.
  *  - q26_ltv_deciles: the nine decile boundaries of per-customer
  *    lifetime value (cent-exact order sums) via
  *    [[graft.operators.Selection.selectRanksBounded]] — the multi-rank
  *    driver-assisted selection: two distributed passes over the LTV
  *    histogram, every artifact domain-bounded, NO global sort and no
  *    per-group cumulative window at any scale. The oracle restates the
  *    same "min value whose cumulative count reaches ⌈k·n/10⌉" rule as
  *    a cumulative-window walk.
  *  - t30_lexical_diversity: per-document type-token ratio and hapax
  *    fraction (words occurring exactly once / distinct words) — the
  *    classic lexical-diversity pair next to t20 (entropy) and t21
  *    (readability). One explode, two doc-keyed hash aggregates, exact
  *    integer numerators.
  *
  * Scale shapes: e36 is three hash aggregates chained by user-keyed
  * joins (no window, no self-join over events); q26's selection
  * artifacts are value-domain-, not row-, proportional; t30 is the tp35
  * explode-aggregate shape.
  *
  * Reference context: no counterpart; extends the e- (product
  * analytics), q- (warehouse) and t- (text statistics) layers.
  */
object Extended95 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- e36: strict-sequence funnel with per-stage conversion ----
    "e36_funnel_conversion" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("fv"))
      val win = 7L * 86400000000L // 7-day stage window, µs
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("us") >= col("fv") && col("us") <= col("fv") + win)
        .groupBy("user_id").agg(min("us").as("fc"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("us") >= col("fc") && col("us") <= col("fc") + win)
        .groupBy("user_id").agg(min("us").as("fp"))
      val stages = v.agg(count(lit(1)).as("n")).select(lit(1).as("stage"),
          lit("view").as("name"), col("n"))
        .unionAll(c.agg(count(lit(1)).as("n"))
          .select(lit(2).as("stage"), lit("view>click").as("name"), col("n")))
        .unionAll(p.agg(count(lit(1)).as("n"))
          .select(lit(3).as("stage"), lit("view>click>purchase").as("name"),
            col("n")))
      // rate vs the previous stage: the 3-row artifact self-joins freely
      stages.as("a")
        .join(stages.as("b"), col("b.stage") === col("a.stage") - 1, "left")
        .select(col("a.stage").as("stage"), col("a.name").as("name"),
          col("a.n").as("n_users"),
          round(col("a.n").cast("double") /
            coalesce(col("b.n"), col("a.n")).cast("double"), 6).as("conversion"))
        .orderBy("stage")
    }),

    // ---- q26: customer-LTV decile boundaries, bounded selection ----
    "q26_ltv_deciles" -> ((s, d) => {
      val ltv = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      val hist = ltv.groupBy("v").agg(count(lit(1)).as("c"))
      val targets = (1 to 9).map(k =>
        (s"d$k", (tw: Long) => (k * tw + 9) / 10)) // ceil(k·tw/10)
      graft.operators.Selection.selectRanksBounded(hist, Seq.empty, "v", "c",
          targets, "decile", "boundary_cents", bucketWidth = 1048576.0)
        .orderBy("decile")
    }),

    // ---- t30: type-token ratio + hapax fraction ----
    "t30_lexical_diversity" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      w.groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") /
            col("n_tokens").cast("double"), 6).as("ttr"),
          round(col("n_hapax").cast("double") /
            col("n_types").cast("double"), 6).as("hapax_frac"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e36_funnel_conversion" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS fv FROM ev
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT ev.user_id, min(us) AS fc
               FROM ev JOIN v USING (user_id)
               WHERE event_type = 'click'
                 AND us >= fv AND us <= fv + 604800000000 GROUP BY 1),
         p AS (SELECT ev.user_id, min(us) AS fp
               FROM ev JOIN c USING (user_id)
               WHERE event_type = 'purchase'
                 AND us >= fc AND us <= fc + 604800000000 GROUP BY 1),
         stages AS (
           SELECT 1 AS stage, 'view' AS name, count(*) AS n FROM v
           UNION ALL SELECT 2, 'view>click', count(*) FROM c
           UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM p)
         SELECT a.stage, a.name, a.n AS n_users,
           round(CAST(a.n AS DOUBLE)
             / CAST(coalesce(b.n, a.n) AS DOUBLE), 6) AS conversion
         FROM stages a LEFT JOIN stages b ON b.stage = a.stage - 1
         ORDER BY a.stage""",
    "q26_ltv_deciles" ->
      """WITH ltv AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM orders GROUP BY 1),
         hist AS (SELECT v, count(*) AS c FROM ltv GROUP BY 1),
         cum AS (
           SELECT v, sum(c) OVER (ORDER BY v) AS cw, sum(c) OVER () AS tw
           FROM hist),
         k AS (SELECT unnest(range(1, 10)) AS k)
         SELECT 'd' || k AS decile, min(v) AS boundary_cents
         FROM cum CROSS JOIN k
         WHERE cw >= (k * tw + 9) // 10
         GROUP BY k ORDER BY decile""",
    "t30_lexical_diversity" ->
      """WITH w AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
           round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_frac
         FROM wc GROUP BY doc_id ORDER BY doc_id"""
  )
}
