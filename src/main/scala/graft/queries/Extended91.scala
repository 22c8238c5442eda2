package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Text

/** Round-7 batch 91: budget-capped corpus selection, and month-over-month
  * revenue growth ranking.
  *
  *  - tp34_token_budget_trim: the budget-capped greedy selection every
  *    curation run ends with — per source, documents ranked by length
  *    (n_chars desc, doc_id asc as the deterministic tie), taken while
  *    the running token total stays ≤ 50k. Emits per source: docs kept,
  *    exact tokens kept, and budget utilization. The cumulative walk is
  *    a SOURCE-KEYED window (domain-parallel — one reducer per source,
  *    never one global sort), the tp24 discipline; counts are exact
  *    BIGINTs, utilization is the one division.
  *  - q25_mom_growth: month-over-month revenue growth per part brand
  *    bucket (partkey mod 10 — the lite schema's brand stand-in):
  *    monthly cent-exact revenue, the previous month via lag over the
  *    calendar-bounded (bucket, month) summary, and the growth ratio —
  *    the classic BI query shape (calendar window over a pre-aggregated
  *    summary, never over fact rows).
  *
  * Scale shape: tp34 shuffles once on source for the windows (sources
  * are a bounded domain); q25's lag window runs over the ≤ buckets ×
  * months summary — both 100 TB shapes.
  *
  * Reference context: no counterpart; tp34 completes the curation
  * endgame (score → rank → TRIM TO BUDGET), q25 rounds out the TPC-H
  * analog family with the growth restatement of q6's revenue delta.
  */
object Extended91 {
  type Q = (SparkSession, String) => DataFrame

  private val Budget = 50000L

  val queries: Map[String, Q] = Map(
    "tp34_token_budget_trim" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          Text.tokenCount(col("text")).cast("long").as("nt"))
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val cum = docs.select(col("source"), col("nt"),
        sum("nt").over(w).as("cum_nt"))
      val kept = cum.filter(col("cum_nt") <= Budget)
      val tot = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens_total"))
      tot.join(
          kept.groupBy("source")
            .agg(count(lit(1)).as("n_kept"), sum("nt").as("tokens_kept")),
          Seq("source"), "left")
        .na.fill(0L, Seq("n_kept", "tokens_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tokens_total"), col("tokens_kept"),
          round(col("tokens_kept").cast("double") / Budget.toDouble, 6)
            .as("utilization"))
        .orderBy("source")
    }),

    "q25_mom_growth" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select((col("l_partkey") % 10).as("brand"),
          date_trunc("month", col("l_shipdate")).as("mon"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
      val monthly = li.groupBy("brand", "mon")
        .agg(sum("rev_c").as("rev_c"))
      val w = Window.partitionBy("brand").orderBy("mon")
      monthly.select(col("brand"),
          date_format(col("mon"), "yyyy-MM").as("month"),
          col("rev_c"), lag("rev_c", 1).over(w).as("prev_c"))
        .filter(col("prev_c").isNotNull)
        .select(col("brand"), col("month"), col("rev_c"), col("prev_c"),
          round((col("rev_c") - col("prev_c")).cast("double") /
            col("prev_c").cast("double"), 6).as("growth"))
        .orderBy("brand", "month")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp34_token_budget_trim" ->
      s"""WITH d AS (
           SELECT doc_id, source, n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS nt
           FROM documents),
         c AS (
           SELECT source, nt,
             CAST(sum(nt) OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_nt
           FROM d),
         k AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(nt) AS BIGINT) AS tokens_kept
           FROM c WHERE cum_nt <= $Budget GROUP BY source),
         tt AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS tokens_total
           FROM d GROUP BY source)
         SELECT source, n_docs, coalesce(n_kept, 0) AS n_kept,
           tokens_total, coalesce(tokens_kept, 0) AS tokens_kept,
           round(CAST(coalesce(tokens_kept, 0) AS DOUBLE) / $Budget.0, 6)
             AS utilization
         FROM tt LEFT JOIN k USING (source)
         ORDER BY source""",
    "q25_mom_growth" ->
      """WITH li AS (
           SELECT l_partkey % 10 AS brand,
             date_trunc('month', l_shipdate) AS mon,
             CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
               AS rev_c
           FROM lineitem),
         m AS (
           SELECT brand, mon, CAST(sum(rev_c) AS BIGINT) AS rev_c
           FROM li GROUP BY brand, mon),
         g AS (
           SELECT brand, strftime(mon, '%Y-%m') AS month, rev_c,
             lag(rev_c, 1) OVER (PARTITION BY brand ORDER BY mon) AS prev_c
           FROM m)
         SELECT brand, month, rev_c, prev_c,
           round(CAST(rev_c - prev_c AS DOUBLE) / CAST(prev_c AS DOUBLE), 6)
             AS growth
         FROM g WHERE prev_c IS NOT NULL
         ORDER BY brand, month"""
  )
}
