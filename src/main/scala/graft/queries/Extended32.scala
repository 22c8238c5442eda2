package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 32: training-data pipeline reporting
  * and behavioral-flow analysis.
  *
  *  - tp10: the curation FUNNEL REPORT — every serious data pipeline
  *    publishes per-stage survivor counts (how many docs passed length,
  *    language, quality, dedup). All four stage flags are computed in ONE
  *    pass over the corpus (no per-stage re-scan), aggregated with
  *    conditional counts, and unpivoted to a (stage, n_in, n_out) table.
  *  - tp11: token-budget domain mixing — allocate a global token budget
  *    equally across sources, rank docs inside each source by a
  *    deterministic md5, and keep the prefix whose running token sum fits
  *    the quota. The running sum is a per-source window (key-local at
  *    scale); selection is reproducible across runs and engines.
  *  - e22: user-journey transition matrix — per-user lag() over event
  *    time yields (prev, cur) pairs; counts plus per-prev shares. The lag
  *    window partitions by user, so state is per-key and shuffle-local.
  */
object Extended32 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp10: curation funnel report ----
    "tp10_quality_funnel" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        col("lang"), col("n_chars"))
      // stage flags, one scan: length → language → token count → exact dedup
      // (keep-first by doc_id among docs that survived the earlier stages)
      val flagged = docs
        .withColumn("f_len", col("n_chars") >= 100)
        .withColumn("f_lang", col("lang") === "en")
        .withColumn("f_tok", size(split(col("text"), " ")) >= 20)
      val surv3 = flagged.filter(col("f_len") && col("f_lang") && col("f_tok"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("text").orderBy("doc_id")))
        .select(col("doc_id"), (col("rk") === 1).as("f_uniq"))
      val agg = flagged.join(surv3, Seq("doc_id"), "left")
        .agg(
          count(lit(1)).as("n0"),
          count_if(col("f_len")).as("n1"),
          count_if(col("f_len") && col("f_lang")).as("n2"),
          count_if(col("f_len") && col("f_lang") && col("f_tok")).as("n3"),
          count_if(coalesce(col("f_uniq"), lit(false))).as("n4"))
      agg.select(expr(
          """stack(4,
             'length_ge_100', n0, n1,
             'lang_en', n1, n2,
             'tokens_ge_20', n2, n3,
             'exact_dedup', n3, n4) AS (stage, n_in, n_out)"""))
        .orderBy("n_in", "stage")
    }),

    // ---- tp11: token-budget domain mix ----
    "tp11_token_budget_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
      val nSources = docs.select("source").distinct().count()
      val quota = 50000L / nSources
      val ranked = docs.withColumn("cum",
        sum("toks").over(Window.partitionBy("source")
          .orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ranked.filter(col("cum") <= quota)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens_kept"))
        .orderBy("source")
    }),

    // ---- e22: user-journey transition matrix ----
    "e22_transition_matrix" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = ev.withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("prev_type").agg(sum("n").as("tot"))
      counts.join(broadcast(totals), "prev_type")
        .select(col("prev_type"), col("event_type").as("cur_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("share"))
        .orderBy("prev_type", "cur_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp10_quality_funnel" ->
      """WITH f AS (
           SELECT doc_id, text,
             n_chars >= 100 AS f_len,
             lang = 'en' AS f_lang,
             len(string_split(text, ' ')) >= 20 AS f_tok
           FROM documents),
         s3 AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1 AS f_uniq
           FROM f WHERE f_len AND f_lang AND f_tok),
         a AS (
           SELECT count(*) AS n0,
             CAST(count_if(f_len) AS BIGINT) AS n1,
             CAST(count_if(f_len AND f_lang) AS BIGINT) AS n2,
             CAST(count_if(f_len AND f_lang AND f_tok) AS BIGINT) AS n3,
             CAST(count_if(coalesce(f_uniq, false)) AS BIGINT) AS n4
           FROM f LEFT JOIN s3 USING (doc_id))
         SELECT stage, n_in, n_out FROM (
           SELECT 'length_ge_100' AS stage, n0 AS n_in, n1 AS n_out FROM a
           UNION ALL SELECT 'lang_en', n1, n2 FROM a
           UNION ALL SELECT 'tokens_ge_20', n2, n3 FROM a
           UNION ALL SELECT 'exact_dedup', n3, n4 FROM a)
         ORDER BY n_in, stage""",
    "tp11_token_budget_mix" ->
      """WITH docs AS (
           SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         q AS (SELECT 50000 // count(DISTINCT source) AS quota FROM docs),
         ranked AS (
           SELECT source, toks,
             sum(toks) OVER (PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM docs)
         SELECT source, count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens_kept
         FROM ranked, q WHERE cum <= quota
         GROUP BY source ORDER BY source""",
    "e22_transition_matrix" ->
      """WITH pairs AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
           FROM events),
         c AS (
           SELECT prev_type, event_type AS cur_type, count(*) AS n
           FROM pairs WHERE prev_type IS NOT NULL
           GROUP BY prev_type, event_type),
         t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
               FROM c GROUP BY prev_type)
         SELECT prev_type, cur_type, n,
           round(CAST(n AS DOUBLE) / tot, 6) AS share
         FROM c JOIN t USING (prev_type)
         ORDER BY prev_type, cur_type"""
  )
}
