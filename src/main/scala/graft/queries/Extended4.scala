package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity
import graft.spatial.ZOrder

/** Round-2 surface extensions, batch 4: weekly cohort retention, the native
  * session-window operator, grouped approximate quantiles, rational-idf
  * TF-IDF scoring, a kNN *join* (many query vectors at once) planned through
  * the custom GroupTopK operator, and Morton (Z-order) spatial cells — each
  * with a DuckDB oracle.
  */
object Extended4 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- weekly cohort retention matrix ----
    // cohort = user's first active ISO week; one row per (cohort, offset).
    "e12_retention_cohort" -> ((s, d) => {
      val weekly = t(s, d, "events")
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val cohort = weekly.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      weekly.join(cohort, "user_id")
        .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // ---- native session windows (SessionWindow + UpdatingSessionsExec) ----
    // Same 30-minute gap as the manual island form (e2/e4) but through
    // Spark's session_window operator: an event extends the session while
    // its timestamp is <= the previous session end, so a gap of exactly
    // 30 min still merges and only a strictly larger gap opens a new
    // session (proved at the boundary in Extended4Spec) — mirrored in the
    // oracle's `> INTERVAL 30 MINUTE` break condition.
    "e13_session_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("total"))
        .orderBy("user_id", "session_start")),

    // ---- grouped approximate quantiles (GK sketch) ----
    // accuracy 1e6 >> group sizes at every test sf, so the rank error is
    // < 1 row and the sketch answer collapses to the exact discrete
    // quantile the oracle states.
    "a12_approx_quantile" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(1000000)).as("qs"))
        .select(col("event_type"), col("qs")(0).as("p50"),
          col("qs")(1).as("p90"), col("qs")(2).as("p99"))
        .orderBy("event_type")),

    // ---- TF-IDF: top term per document ----
    // Rational idf (N+1)/(df+1) instead of a log keeps the score a single
    // correctly-rounded IEEE division — bit-identical across engines, so
    // the per-document argmax needs no tolerance.
    "t10_tfidf_top_term" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nDocs = docs.count()
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term")
        .withColumn("score", (col("tf") * lit(nDocs + 1)).cast("double") / (col("df") + 1))
      // argmax via a partial-aggregable min(struct): (-score, term) ascending
      // == (score desc, term asc) — the window form would sort-shuffle every
      // (doc, term) row just to keep one per doc
      scored.groupBy("doc_id")
        .agg(min(struct((-col("score")).as("ns"), col("term"))).as("m"))
        .select(col("doc_id"), col("m.term").as("term"),
          round(-col("m.ns"), 4).as("tfidf"))
        .orderBy("doc_id")
    }),

    // ---- kNN join: top-5 neighbours for each of 20 query vectors ----
    // The many-queries form of ann_brute_topk, planned through the custom
    // GroupTopK operator: the shuffle carries at most 5 rows per query per
    // map partition instead of every scored pair. Ordered by the raw
    // cosine (bit-exact both engines) so boundary ties cannot flip the
    // selected set; the rounded value is only presentation.
    "j11_knn_join" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      val pairs = e.filter(col("vec_id") >= 20).crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("c"))
      graft.plans.GroupTopK.topK(pairs, Seq("qid"), Seq(("c", false), ("vec_id", true)), 5)
        .select(col("qid"), col("vec_id"), round(col("c"), 4).as("sim"))
        .orderBy(col("qid"), col("sim").desc, col("vec_id"))
    }),

    // ---- Morton (Z-order) spatial cells: hottest 20 cells ----
    // The space-filling-curve layout key for 100 TB spatial data (see
    // graft.spatial.ZOrder); here computed with codegen'd integer
    // built-ins and aggregated, matched bit-for-bit by the oracle's
    // unrolled shift/mask arithmetic.
    "g8_zorder_cell" -> ((s, d) => {
      val x = least(floor(col("value") / lit(2.0)), lit(255.0)).cast("long")
      val y = pmod(col("user_id"), lit(256)).cast("long")
      t(s, d, "events")
        .select(ZOrder.interleave(x, y, 8).as("zcell"))
        .groupBy("zcell").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("zcell")).limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e12_retention_cohort" ->
      """WITH weekly AS (
           SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
         coh AS (SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY user_id)
         SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_wk,
           CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_offset,
           count(DISTINCT w.user_id) AS n_users
         FROM weekly w JOIN coh USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "e13_session_window" ->
      """WITH g AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS total
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "a12_approx_quantile" ->
      """SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "t10_tfidf_top_term" ->
      """WITH n AS (SELECT count(*) AS nd FROM documents),
         tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM tok2) GROUP BY 1),
         sc AS (
           SELECT doc_id, tf.term, (tf * (n.nd + 1))::DOUBLE / (df + 1) AS score
           FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
         r AS (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
           FROM sc)
         SELECT doc_id, term, round(score, 4) AS tfidf
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    "j11_knn_join" -> {
      import OracleSql.cosExact
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                     FROM embeddings WHERE vec_id < 20),
         v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings WHERE vec_id >= 20),
         p AS (SELECT qid, vec_id, ${cosExact("ev", "qv")} AS c
               FROM v CROSS JOIN q),
         r AS (SELECT qid, vec_id, c,
                 row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn
               FROM p)
         SELECT qid, vec_id, round(c, 4) AS sim
         FROM r WHERE rn <= 5 ORDER BY qid, sim DESC, vec_id"""
    },
    "g8_zorder_cell" -> {
      val z = ZOrder.sqlExpr("x", "y", 8)
      s"""WITH cells AS (
           SELECT CAST(least(floor(value / 2), 255) AS BIGINT) AS x,
             user_id % 256 AS y
           FROM events)
         SELECT $z AS zcell, count(*) AS n
         FROM cells GROUP BY 1
         ORDER BY n DESC, zcell LIMIT 20"""
    }
  )
}
