package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-3 surface extensions, batch 12: encoding scalars, array
  * higher-order functions, exact heavy hitters, order-sensitive folds
  * (EWMA), moving percentiles, BM25 relevance, bounded-edit-distance fuzzy
  * joins, and distribution impurity — each with a DuckDB oracle.
  *
  * Scale notes are per query; the common thread is that every shape here
  * is partial-aggregation-friendly or blocking-key-bounded, so none of
  * them degenerates to an all-pairs or single-partition plan at 100 TB.
  */
object Extended12 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- encoding scalars: base64 / hex round trips ----
    // Codegen'd built-ins; both engines use RFC 4648 base64 without line
    // breaks, and hex case is normalized on both sides.
    "f18_encoding_battery" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          base64(col("p_name").cast("binary")).as("b64"),
          lower(hex(col("p_partkey"))).as("hx"),
          unbase64(base64(col("p_name").cast("binary"))).cast("string").as("back"))
        .orderBy("p_partkey")),

    // ---- array higher-order functions: filter / exists / forall / fold ----
    // All four HOFs evaluate inside the row pipeline (no explode+rejoin):
    // the per-order array is built once in a partial-aggregable
    // collect_list, then every predicate is a map-side expression.
    "f19_hof_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity").cast("double"))).as("qs"))
        .select(col("l_orderkey"),
          size(expr("filter(qs, x -> x > 25.0d)")).as("n_big"),
          expr("exists(qs, x -> x > 45.0d)").as("has_huge"),
          expr("forall(qs, x -> x >= 1.0d)").as("all_pos"),
          round(expr("aggregate(qs, 0.0d, (acc, x) -> acc + x)"), 2).as("total"))
        .orderBy("l_orderkey")),

    // ---- exact heavy hitters: parts above a global frequency threshold ----
    // Two mergeable aggregates (per-key counts + the global total) and a
    // threshold filter: the classic exact form of frequent-item mining.
    // Partial aggregation bounds every shuffle at (distinct keys); the
    // total rides in as a 1-row broadcast, never a window over the table.
    "a14_heavy_hitters" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val total = li.agg(count(lit(1)).as("total"))
      li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt").cast("double") > col("total") * 0.0006)
        .select(col("l_partkey"), col("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey"))
    }),

    // ---- moving median: sliding exact percentile window ----
    // percentile() as a window aggregate over a 5-row trailing frame;
    // interpolation parity with quantile_cont is pinned by a5/a10.
    "w8_moving_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      t(s, d, "events")
        .withColumn("med5", round(percentile(col("value"), lit(0.5)).over(w), 6))
        .select("event_id", "user_id", "med5")
        .orderBy("event_id")
    }),

    // ---- EWMA: order-sensitive recursive fold over an event sequence ----
    // y₁ = x₁; yₜ = α·xₜ + (1-α)·yₜ₋₁ (α = 0.25, exact in binary). The
    // recurrence needs a sequential fold, which no built-in window
    // aggregate expresses — so the trailing sequence rides a bounded
    // 8-row frame as a collect_list and folds map-side. Both engines seed
    // the fold with the first element and fold ascending, so the IEEE
    // result is bit-identical. The 6-dp rounding is floor(x*1e6 + 0.5)/1e6
    // rather than round(): α = 0.25 is exact in binary, so EWMA values land
    // exactly on ties at 6 dp, where Spark's BigDecimal HALF_UP and
    // DuckDB's double rounding disagree — the floor form is the same IEEE
    // op sequence on both engines, so it can't tie-break differently.
    "e15_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
      t(s, d, "events")
        .withColumn("xs", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"),
          (floor(expr(
            "aggregate(slice(xs, 2, size(xs) - 1), xs[0], (acc, x) -> 0.25d * x + 0.75d * acc)"
          ) * lit(1e6) + lit(0.5)) / lit(1e6)).as("ewma"))
        .orderBy("event_id")
    }),

    // ---- BM25: per-document top term (k1 = 1.2, b = 0.75) ----
    // Rational idf (N+1)/(df+1) as in t10; the length normalization uses
    // one shared avgdl scalar (1-row broadcast). Argmax per doc is the
    // partial-aggregable min(struct) — no per-doc sort shuffle.
    "t17_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nDocs = docs.count()
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val avgdl = dl.agg(avg(col("dl").cast("double")).as("avgdl"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term").join(dl, "doc_id")
        .crossJoin(broadcast(avgdl))
        .withColumn("idf", lit((nDocs + 1).toDouble) / (col("df") + 1))
        .withColumn("score", col("idf") *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
      scored.groupBy("doc_id")
        .agg(min(struct((-col("score")).as("ns"), col("term"))).as("m"))
        .select(col("doc_id"), col("m.term").as("term"),
          round(-col("m.ns"), 4).as("bm25"))
        .orderBy("doc_id")
    }),

    // ---- fuzzy self-join: near-duplicate part names within a block ----
    // Blocking keys (brand, container) bound the candidate space to
    // |block|² instead of |table|²; the bounded levenshtein (threshold 2)
    // early-exits the DP once the band exceeds the limit, so the verify
    // cost per pair is O(k·n), not O(n²). The same blocking-then-verify
    // shape is how fuzzy dedup survives web-scale catalogs.
    "j13_fuzzy_name_join" -> ((s, d) => {
      val p = t(s, d, "part").select("p_partkey", "p_brand", "p_size", "p_name")
      val a = p.select(col("p_brand"), col("p_size"),
        col("p_partkey").as("a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("p_size"),
        col("p_partkey").as("b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "p_size"))
        .filter(col("a") < col("b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
        .select(col("p_brand"), col("a"), col("b"), col("dist"))
        .orderBy("p_brand", "a", "b")
    }),

    // ---- distribution impurity: Gini index of token mass per source ----
    // 1 - Σᵢ pᵢ² with p = tf/total, computed as 1 - Σtf²/total²: one
    // division at the end, so both engines do identical IEEE arithmetic.
    "t18_gini_impurity" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      toks.groupBy("source", "term").agg(count(lit(1)).as("tf"))
        .groupBy("source")
        .agg(sum(col("tf") * col("tf")).as("ss"), sum(col("tf")).as("tot"))
        .select(col("source"),
          round(lit(1.0) - col("ss").cast("double") /
            (col("tot") * col("tot")).cast("double"), 6).as("gini"))
        .orderBy("source")
    }),

    // ---- batch twin of the streaming left-outer interval join ----
    // Every purchase keeps its row whether or not a click preceded it
    // within 30 minutes; the streaming form (EventStream.funnelLeftJoin,
    // parity-pinned in StreamingSpec) is the same plan with watermarks
    // bounding the outer-side state.
    "e16_interval_left_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("b_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      buys.join(clicks,
          col("user_id") === col("c_user") &&
          col("c_ts") <= col("b_ts") &&
          col("c_ts") >= col("b_ts") - expr("interval 30 minutes"), "left")
        .groupBy("user_id", "purchase_id")
        .agg(count(col("click_id")).as("n_clicks"),
          min(col("c_ts")).as("first_click"))
        .orderBy("user_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f18_encoding_battery" ->
      """SELECT p_partkey, to_base64(encode(p_name)) AS b64,
           lower(to_hex(p_partkey)) AS hx,
           decode(from_base64(to_base64(encode(p_name)))) AS back
         FROM part ORDER BY p_partkey""",
    "f19_hof_battery" ->
      """WITH g AS (
           SELECT l_orderkey,
             list_sort(list(CAST(l_quantity AS DOUBLE))) AS qs
           FROM lineitem GROUP BY l_orderkey)
         SELECT l_orderkey,
           len(list_filter(qs, x -> x > 25.0)) AS n_big,
           len(list_filter(qs, x -> x > 45.0)) > 0 AS has_huge,
           len(list_filter(qs, x -> x >= 1.0)) = len(qs) AS all_pos,
           round(list_reduce(list_prepend(0.0, qs), (acc, x) -> acc + x), 2) AS total
         FROM g ORDER BY l_orderkey""",
    "a14_heavy_hitters" ->
      """SELECT l_partkey, count(*) AS cnt
         FROM lineitem GROUP BY l_partkey
         HAVING CAST(count(*) AS DOUBLE) >
           (SELECT count(*) FROM lineitem) * 0.0006
         ORDER BY cnt DESC, l_partkey""",
    "w8_moving_median" ->
      """SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
         FROM events ORDER BY event_id""",
    "e15_ewma" ->
      """SELECT event_id, user_id,
           floor(list_reduce(list(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
             (acc, x) -> 0.25 * x + 0.75 * acc) * 1e6 + 0.5) / 1e6 AS ewma
         FROM events ORDER BY event_id""",
    "t17_bm25" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tk AS (SELECT doc_id, term FROM toks WHERE len(term) > 0),
         n AS (SELECT count(*) AS n_docs FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
         ad AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY term),
         scored AS (
           SELECT tf.doc_id, tf.term,
             (CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) *
             (tf.tf * 2.2) /
             (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / ad.avgdl))) AS score
           FROM tf, dfreq, dl, ad, n
           WHERE tf.term = dfreq.term AND tf.doc_id = dl.doc_id)
         SELECT doc_id, term, round(score, 4) AS bm25
         FROM scored
         QUALIFY row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) = 1
         ORDER BY doc_id""",
    "j13_fuzzy_name_join" ->
      """SELECT a.p_brand, a.p_partkey AS a, b.p_partkey AS b,
           levenshtein(a.p_name, b.p_name) AS dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY a.p_brand, a, b""",
    "t18_gini_impurity" ->
      """WITH toks AS (
           SELECT source, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (SELECT source, term, count(*) AS tf FROM toks
                WHERE len(term) > 0 GROUP BY source, term)
         SELECT source,
           round(1.0 - CAST(sum(tf * tf) AS DOUBLE) /
             CAST(sum(tf) * sum(tf) AS DOUBLE), 6) AS gini
         FROM tf GROUP BY source ORDER BY source""",
    "e16_interval_left_join" ->
      """WITH b AS (SELECT user_id, event_id AS purchase_id, ts AS b_ts
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
                  FROM events WHERE event_type = 'click')
         SELECT b.user_id, b.purchase_id,
           count(c.click_id) AS n_clicks, min(c.c_ts) AS first_click
         FROM b LEFT JOIN c
           ON b.user_id = c.user_id
           AND c.c_ts <= b.b_ts
           AND c.c_ts >= b.b_ts - INTERVAL 30 MINUTE
         GROUP BY b.user_id, b.purchase_id
         ORDER BY b.user_id, b.purchase_id"""
  )
}
