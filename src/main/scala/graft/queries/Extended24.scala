package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 24: the strict-ordered multi-step
  * funnel (the product-analytics shape e10's single-band join cannot
  * express) and benchmark decontamination as an ACTION (t16 reports
  * contamination; tp7 removes it from the training split — the step a
  * training-data pipeline actually ships).
  */
object Extended24 {
  type Q = (SparkSession, String) => DataFrame

  /** Funnel step window: each step must follow the previous within this
    * many seconds. */
  private val StepSec = 86400L

  val queries: Map[String, Q] = Map(
    // ---- e19: strict-ordered 3-step funnel (click → view → purchase) ----
    // Each user's first click, the first view AFTER it (within 24 h), the
    // first purchase after THAT view (within 24 h) — order matters, which
    // is what separates a funnel from three independent filters. Three
    // conditional min-aggregations, each a user_id-co-partitioned join +
    // partial-aggregatable min: window-free, so the plan is three
    // shuffles on the same key (and AQE coalesces them), not a per-user
    // sort. Missing steps stay NULL and cascade.
    "e19_funnel3" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("sec").as("t_click"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("sec").as("vs"))
      val s2 = clicks.join(views,
          col("user_id") === col("vu") && col("vs") >= col("t_click") &&
            col("vs") <= col("t_click") + StepSec, "left")
        .groupBy("user_id", "t_click").agg(min("vs").as("t_view"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("sec").as("ps"))
      val s3 = s2.join(buys,
          col("user_id") === col("pu") && col("ps") >= col("t_view") &&
            col("ps") <= col("t_view") + StepSec, "left")
        .groupBy("user_id", "t_click", "t_view").agg(min("ps").as("t_purchase"))
      s3.select(col("user_id"), col("t_click"), col("t_view"), col("t_purchase"),
          (lit(1) + when(col("t_view").isNotNull, 1).otherwise(0) +
            when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy("user_id")
    }),

    // ---- tp7: decontaminated train/eval split ----
    // t16 reports 5-gram contamination; this REMOVES it: eval = every
    // 20th doc, train = the rest minus any doc sharing a 5-gram span
    // with the eval set (dropped). Same scale shape as t16 — the only
    // join is on the shingle string with the (small) eval side broadcast;
    // the corpus streams map-side, and the drop set comes back as one
    // distinct id relation, never a doc×doc pair list.
    "tp7_decontaminated_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sh = docs
        .select(col("doc_id"), expr(Extended9.toks).as("ws"))
        .filter(size(col("ws")) >= 5)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(5, size(ws)), " +
            "i -> array_join(slice(ws, i - 4, 5), ' ')))")).as("s"))
      val evalSh = sh.filter(col("doc_id") % 20 === 0).select("s").distinct()
      val dropped = sh.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(evalSh), "s")
        .select("doc_id").distinct().withColumn("hit", lit(1))
      docs.select("doc_id")
        .join(dropped, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 20 === 0, "eval")
            .when(col("hit") === 1, "dropped")
            .otherwise("train").as("split"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e19_funnel3" ->
      s"""WITH ev AS (
           SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         c AS (
           SELECT user_id, min(sec) AS t_click FROM ev
           WHERE event_type = 'click' GROUP BY user_id),
         v AS (
           SELECT c.user_id, c.t_click, min(e.sec) AS t_view
           FROM c LEFT JOIN ev e
             ON e.user_id = c.user_id AND e.event_type = 'view'
            AND e.sec >= c.t_click AND e.sec <= c.t_click + $StepSec
           GROUP BY c.user_id, c.t_click),
         p AS (
           SELECT v.user_id, v.t_click, v.t_view, min(e.sec) AS t_purchase
           FROM v LEFT JOIN ev e
             ON e.user_id = v.user_id AND e.event_type = 'purchase'
            AND e.sec >= v.t_view AND e.sec <= v.t_view + $StepSec
           GROUP BY v.user_id, v.t_click, v.t_view)
         SELECT user_id, t_click, t_view, t_purchase,
           CAST(1 + CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END
             AS INT) AS stage
         FROM p ORDER BY user_id""",
    "tp7_decontaminated_split" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(5, len(ws) + 1),
               i -> array_to_string(ws[i - 4 : i], ' '))) AS s
           FROM toks WHERE len(ws) >= 5),
         ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         dropped AS (
           SELECT DISTINCT doc_id FROM sh
           WHERE doc_id % 20 != 0 AND s IN (SELECT s FROM ev))
         SELECT d.doc_id,
           CASE WHEN d.doc_id % 20 = 0 THEN 'eval'
                WHEN dr.doc_id IS NOT NULL THEN 'dropped'
                ELSE 'train' END AS split
         FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
         ORDER BY d.doc_id"""
  )
}
