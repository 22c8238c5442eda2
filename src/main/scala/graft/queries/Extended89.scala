package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.{Dedup, Text}
import graft.operators.{AsOfJoin, Selection}

/** Round-7 batch 89: conversion-lag order statistics, and what the
  * near-dedup pass actually costs in tokens — the two numbers behind a
  * funnel review and a dedup sign-off respectively.
  *
  *  - e32_conversion_lag_quantiles: for every click, the time to the
  *    user's NEXT purchase (the one-shuffle as-of forward join e23
  *    established, clicks→purchases this time), folded into a
  *    second-granularity histogram and selected at ranks ⌈q·n⌉ for
  *    q ∈ {0.5, 0.9, 0.99} by the bounded two-level selection — the
  *    funnel's "how long does conversion take" panel with NO global
  *    sort and NO float in the rank order. Unconverted clicks drop
  *    (documented: the lag of a conversion that never happened is not a
  *    number; e10/e19 count those).
  *  - t29_dedup_token_impact: per source, what the 0.8-threshold
  *    near-dup pass removes — document count and EXACT token count, and
  *    the removed-token share. Reuses the production keep set
  *    (LSH → verify → connected components → keep-lowest-id), so the
  *    number is the real pipeline's bill, not a proxy; the oracle
  *    replays the same closure with its recursive CTE. This is the
  *    token-accounting row a 100 TB re-shard is approved against.
  *
  * Scale shape: e32 is the one-shuffle as-of merge plus a histogram
  * aggregate (the selection walks bounded bucket summaries); t29 rides
  * the banded LSH join and two hash aggregates — both 100 TB shapes.
  *
  * Reference context: no counterpart; extends the funnel family
  * (e10/e19/e23) with order statistics and the dedup family with the
  * cost-accounting view.
  */
object Extended89 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e32_conversion_lag_quantiles" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("purchase_id"))
        .withColumn("p_ts", col("ts"))
      val lags = AsOfJoin.forward(clicks, buys, Seq("user_id"), "ts",
          rightCols = Seq("purchase_id", "p_ts"))
        .filter(col("p_ts").isNotNull)
        .select(expr("(unix_micros(p_ts) - unix_micros(ts)) div 1000000")
          .as("gap_s"))
      val hist = lags.groupBy("gap_s").agg(count(lit(1)).as("c"))
        .localCheckpoint() // three rank selections share one histogram
      val qs = Seq(0.5, 0.9, 0.99)
      val n = lags.count()
      Selection.selectRanksBounded(hist, Seq.empty, "gap_s", "c",
          qs.map(q => (q.toString, (tw: Long) => math.ceil(q * tw).toLong)),
          "q", "gap_s")
        .select(col("q").cast("double").as("q"), lit(n).as("n_converted"),
          col("gap_s"))
        .orderBy("q")
    }),

    "t29_dedup_token_impact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val keep = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.8)
        .select(col("doc_id").as("kept_id"))
      val tok = docs.select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("nt"))
      tok.join(keep, tok("doc_id") === keep("kept_id"), "left")
        .select(col("source"), col("nt"),
          col("kept_id").isNull.cast("long").as("removed"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"),
          sum("removed").as("n_removed"),
          sum(col("removed") * col("nt")).as("tokens_removed"))
        .select(col("source"), col("n_docs"), col("tokens"), col("n_removed"),
          col("tokens_removed"),
          round(col("tokens_removed").cast("double") /
            col("tokens").cast("double"), 6).as("removed_share"))
        .orderBy("source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e32_conversion_lag_quantiles" ->
      """WITH c AS (
           SELECT user_id, ts, event_id AS click_id FROM events
           WHERE event_type = 'click'),
         b AS (
           SELECT user_id, ts, min(event_id) AS purchase_id FROM events
           WHERE event_type = 'purchase' GROUP BY user_id, ts),
         lag_s AS (
           SELECT CAST(epoch_us(nb.p_ts - c.ts) // 1000000 AS BIGINT) AS gap_s
           FROM c JOIN LATERAL (
             SELECT b.ts AS p_ts FROM b
             WHERE b.user_id = c.user_id AND b.ts >= c.ts
             ORDER BY b.ts LIMIT 1) nb ON true),
         h AS (SELECT gap_s, count(*) AS cnt FROM lag_s GROUP BY gap_s),
         cum AS (
           SELECT gap_s, CAST(sum(cnt) OVER (ORDER BY gap_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM h),
         n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h)
         SELECT q, n AS n_converted, gap_s FROM (
           SELECT CAST(0.5 AS DOUBLE) AS q, n.n, min(gap_s) AS gap_s
           FROM cum, n WHERE cum >= ceil(0.5 * n) GROUP BY n.n
           UNION ALL
           SELECT CAST(0.9 AS DOUBLE), n.n, min(gap_s)
           FROM cum, n WHERE cum >= ceil(0.9 * n) GROUP BY n.n
           UNION ALL
           SELECT CAST(0.99 AS DOUBLE), n.n, min(gap_s)
           FROM cum, n WHERE cum >= ceil(0.99 * n) GROUP BY n.n)
         ORDER BY q""",
    "t29_dedup_token_impact" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashSigCtes},
         cand AS (
           SELECT DISTINCT x1.doc_id AS a, x2.doc_id AS b
           FROM kb x1 JOIN kb x2
             ON x1.band = x2.band AND x1.key = x2.key AND x1.doc_id < x2.doc_id),
         ver AS (
           SELECT cand.a, cand.b FROM cand
             JOIN g ga ON ga.doc_id = cand.a
             JOIN g gb ON gb.doc_id = cand.b
           WHERE CASE WHEN len(ga.grams) + len(gb.grams) = 0 THEN 1.0
             ELSE len(list_intersect(ga.grams, gb.grams)) /
               CAST(len(ga.grams) + len(gb.grams)
                    - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             END >= 0.8),
         sym AS (SELECT a, b FROM ver UNION SELECT b AS a, a AS b FROM ver),
         reach AS (
           SELECT a AS s, b AS t FROM sym
           UNION
           SELECT r.s, e.b FROM reach r JOIN sym e ON r.t = e.a),
         rep AS (SELECT s, least(s, min(t)) AS rep FROM reach GROUP BY s),
         removed AS (SELECT s AS doc_id FROM rep WHERE rep < s),
         tok AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS nt,
             CASE WHEN doc_id IN (SELECT doc_id FROM removed)
               THEN 1 ELSE 0 END AS removed
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS tokens,
           CAST(sum(removed) AS BIGINT) AS n_removed,
           CAST(sum(removed * nt) AS BIGINT) AS tokens_removed,
           round(CAST(sum(removed * nt) AS DOUBLE)
             / CAST(sum(nt) AS DOUBLE), 6) AS removed_share
         FROM tok GROUP BY source ORDER BY source"""
  )
}
