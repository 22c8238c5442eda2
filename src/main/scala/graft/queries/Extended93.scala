package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 93: corpus-quality repetition signals, cohort
  * retention, and tie-corrected rank correlation.
  *
  *  - tp35_repetition_signals: the MassiveText/Gopher-style intra-document
  *    repetitiveness filter — per document, the fraction of word-2-gram
  *    POSITIONS that repeat an earlier position of the same gram
  *    ((n2 − distinct2)/n2) and the share of the document's words taken
  *    by its single most frequent word. High-repetition docs are the
  *    boilerplate/spam the public curation pipelines drop before
  *    training. Both numerators and denominators are exact BIGINTs from
  *    two hash aggregates; each ratio is one terminal division.
  *  - e34_cohort_retention: the classic signup-cohort retention matrix —
  *    cohort = a user's first-activity week (integer epoch-week, pure
  *    integer division so both engines bucket identically), k = weeks
  *    since cohort (0..3); each cell counts distinct active users and
  *    divides by the cohort's week-0 size. Two hash aggregates and one
  *    user-keyed join; the matrix itself is calendar-bounded.
  *  - a44_kendall_tau: tie-corrected Kendall τ-b per event type between
  *    the DAILY event count and the DAILY exact cent volume:
  *    S = C − D over day pairs, τ_b = S / √((n0−t1)(n0−t2)) with
  *    n0 = n(n−1)/2 and t1/t2 the tied-pair corrections of either
  *    series. S, n0, t1, t2 are exact BIGINTs; τ is one terminal
  *    sqrt-and-divide. Completes the correlation family beside a30
  *    (Spearman ρ) and a36 (Mann–Kendall trend).
  *
  * Scale shapes: tp35 is explode → per-doc hash aggregate (corpus-
  * proportional, zero joins beyond the doc-keyed merge); e34 joins on
  * user_id with calendar-bounded output; a44's pair join is bounded by
  * the DAY span squared per type (the a35/a36 argument — 100 TB of
  * events over the same year still collapses to ≤366 daily rows per
  * type, and the series always fits in a broadcast).
  *
  * Reference context: no counterpart; extends the tp- (curation), e-
  * (event analytics) and a- (statistics) layers.
  */
object Extended93 {
  type Q = (SparkSession, String) => DataFrame

  private def daily(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum("cents").as("y"))

  val queries: Map[String, Q] = Map(
    // ---- tp35: intra-document repetition quality signals ----
    "tp35_repetition_signals" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
      val grams = w.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 2), " +
            "i -> concat_ws(' ', words[i], words[i + 1]))")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n2"), count(lit(1)).as("d2"))
      val words = w.select(col("doc_id"), explode(col("words")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max("c").as("maxw"), sum("c").as("nw"))
      grams.join(words, "doc_id")
        .select(col("doc_id"), col("n2"), col("d2"),
          round((col("n2") - col("d2")).cast("double") /
            col("n2").cast("double"), 6).as("gram_rep_frac"),
          round(col("maxw").cast("double") /
            col("nw").cast("double"), 6).as("top_word_share"))
        .orderBy("doc_id")
    }),

    // ---- e34: weekly cohort retention matrix (k = 0..3) ----
    // activity = a qualifying purchase (value > 15): the raw event log is
    // so dense every user fires weekly, which would make every retention
    // cell 1.0 and the query a no-op gate — the qualifying-action form is
    // also the PRODUCT definition of retention (did the user come back
    // and DO the thing), not mere presence
    "e34_cohort_retention" -> ((s, d) => {
      val acts = t(s, d, "events")
        .filter(col("event_type") === "purchase" && col("value") > 15)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("w"))
        .distinct()
      val cohorts = acts.groupBy("user_id").agg(min("w").as("cw"))
      val cells = acts.join(cohorts, "user_id")
        .select(col("cw"), (col("w") - col("cw")).as("k"))
        .filter(col("k") <= 3)
        .groupBy("cw", "k").agg(count(lit(1)).as("n_active"))
      val sizes = cells.filter(col("k") === 0)
        .select(col("cw"), col("n_active").as("n0"))
      cells.join(broadcast(sizes), "cw")
        .select(col("cw").as("cohort_week"), col("k"), col("n_active"),
          round(col("n_active").cast("double") /
            col("n0").cast("double"), 6).as("retention"))
        .orderBy("cohort_week", "k")
    }),

    // ---- a44: Kendall τ-b, daily count vs daily cent volume ----
    "a44_kendall_tau" -> ((s, d) => {
      val dy = daily(s, d)
      val sStat = dy.as("a")
        .join(broadcast(dy.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") > col("a.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(
          (when(col("b.x") > col("a.x"), 1L)
            .when(col("b.x") < col("a.x"), -1L).otherwise(0L)) *
          (when(col("b.y") > col("a.y"), 1L)
            .when(col("b.y") < col("a.y"), -1L).otherwise(0L))).as("s_stat"))
      val n = dy.groupBy("event_type").agg(count(lit(1)).as("n"))
      val tx = dy.groupBy("event_type", "x").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("t1"))
      val ty = dy.groupBy("event_type", "y").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("t2"))
      sStat.join(n, "event_type").join(tx, "event_type").join(ty, "event_type")
        .select(col("event_type"), col("s_stat"),
          round(col("s_stat").cast("double") /
            sqrt(((col("n") * (col("n") - 1) / 2 - col("t1")) *
              (col("n") * (col("n") - 1) / 2 - col("t2"))).cast("double")),
            6).as("tau_b"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp35_repetition_signals" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
         g AS (
           SELECT doc_id, array_to_string(words[i+1:i+2], ' ') AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 1)) AS i) r),
         gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         ga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
                  count(*) AS d2 FROM gc GROUP BY 1),
         wd AS (
           SELECT doc_id, unnest(words) AS word FROM w),
         wc AS (SELECT doc_id, word, count(*) AS c FROM wd GROUP BY 1, 2),
         wa AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS maxw,
                  CAST(sum(c) AS BIGINT) AS nw FROM wc GROUP BY 1)
         SELECT ga.doc_id, n2, d2,
           round(CAST(n2 - d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
             AS gram_rep_frac,
           round(CAST(maxw AS DOUBLE) / CAST(nw AS DOUBLE), 6)
             AS top_word_share
         FROM ga JOIN wa USING (doc_id) ORDER BY doc_id""",
    "e34_cohort_retention" ->
      """WITH acts AS (
           SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS w
           FROM events
           WHERE event_type = 'purchase' AND value > 15),
         cohorts AS (SELECT user_id, min(w) AS cw FROM acts GROUP BY 1),
         cells AS (
           SELECT cw, a.w - cw AS k, count(*) AS n_active
           FROM acts a JOIN cohorts c USING (user_id)
           WHERE a.w - cw <= 3
           GROUP BY 1, 2),
         sizes AS (SELECT cw, n_active AS n0 FROM cells WHERE k = 0)
         SELECT cw AS cohort_week, k, n_active,
           round(CAST(n_active AS DOUBLE) / CAST(n0 AS DOUBLE), 6)
             AS retention
         FROM cells JOIN sizes USING (cw)
         ORDER BY cohort_week, k""",
    "a44_kendall_tau" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*) AS x,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
             CAST(sum(
               (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) *
               (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END))
               AS BIGINT) AS s_stat
           FROM dy a JOIN dy b
             ON a.event_type = b.event_type AND b.day > a.day
           GROUP BY 1),
         n AS (SELECT event_type, count(*) AS n FROM dy GROUP BY 1),
         tx AS (
           SELECT event_type, CAST(sum(c * (c - 1) / 2) AS BIGINT) AS t1
           FROM (SELECT event_type, x, count(*) AS c FROM dy GROUP BY 1, 2)
           GROUP BY 1),
         ty AS (
           SELECT event_type, CAST(sum(c * (c - 1) / 2) AS BIGINT) AS t2
           FROM (SELECT event_type, y, count(*) AS c FROM dy GROUP BY 1, 2)
           GROUP BY 1)
         SELECT event_type, s_stat,
           round(CAST(s_stat AS DOUBLE) /
             sqrt(CAST((n * (n - 1) / 2 - t1) * (n * (n - 1) / 2 - t2)
               AS DOUBLE)), 6) AS tau_b
         FROM s JOIN n USING (event_type) JOIN tx USING (event_type)
           JOIN ty USING (event_type)
         ORDER BY event_type"""
  )
}
