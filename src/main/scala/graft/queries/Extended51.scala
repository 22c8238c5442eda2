package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 51: the dataset card and market
  * concentration.
  *
  *  - tp19: DATASET CARD — the one-pass corpus summary every released
  *    training set ships with (per-language doc/source/char/word
  *    counts, exact-duplicate counts via md5 distinct, word-length
  *    range). All metrics come from a SINGLE scan feeding one grouped
  *    aggregation (count distinct runs as partial-distinct per group);
  *    at 100 TB this is the nightly card job, and every statistic here
  *    is mergeable across shards.
  *  - a24: HERFINDAHL–HIRSCHMAN INDEX of supplier revenue concentration
  *    per nation — Σ shareᵢ² = Σ revᵢ² / (Σ revᵢ)², kept EXACT by
  *    truncating per-supplier revenue to cent units before squaring
  *    (rev div 10⁴ of the 10⁻⁴-scaled sum): every sum is then a BIGINT
  *    fold within int64 range (≤ ~4·10¹⁷ at sf0.1) and the index is one
  *    terminal double division — the same scaled-int discipline as the
  *    TPC-H analogs, applied to a ratio-of-squares statistic.
  */
object Extended51 {
  type Q = (SparkSession, String) => DataFrame

  private def revScaled = (round(col("l_extendedprice") * 100).cast("long") *
    round((lit(1.0) - col("l_discount")) * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // ---- tp19: per-language dataset card ----
    "tp19_dataset_card" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("lang"), col("source"),
        col("n_chars"), size(split(col("text"), " ")).cast("long").as("words"),
        md5(col("text")).as("h"))
      docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        sum("n_chars").as("total_chars"),
        sum("words").as("total_words"),
        (count(lit(1)) - countDistinct("h")).as("exact_dups"),
        min("words").as("min_words"),
        max("words").as("max_words"))
        .orderBy("lang")
    }),

    // ---- a24: exact-integer HHI of supplier revenue per nation ----
    "a24_hhi" -> ((s, d) => {
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val r = t(s, d, "lineitem")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy("nation", "l_suppkey")
        .agg(sum(revScaled).as("rev"))
        .select(col("nation"), expr("rev div 10000").as("revc"))
      r.groupBy("nation").agg(
          count(lit(1)).as("n_suppliers"),
          sum(col("revc") * col("revc")).as("sq"),
          sum(col("revc")).as("tot"))
        .select(col("nation"), col("n_suppliers"),
          round(col("sq").cast("double") /
            (col("tot").cast("double") * col("tot")), 6).as("hhi"))
        .orderBy("nation")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp19_dataset_card" ->
      """WITH d AS (
           SELECT lang, source, n_chars,
             len(string_split(text, ' ')) AS words,
             CAST(md5(text) AS VARCHAR) AS h
           FROM documents)
         SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(words) AS BIGINT) AS total_words,
           CAST(count(*) - count(DISTINCT h) AS BIGINT) AS exact_dups,
           CAST(min(words) AS BIGINT) AS min_words,
           CAST(max(words) AS BIGINT) AS max_words
         FROM d GROUP BY lang ORDER BY lang""",
    "a24_hhi" ->
      """WITH r AS (
           SELECT n.n_name AS nation, l.l_suppkey AS supp,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                      CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
               AS BIGINT) // 10000 AS revc
           FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           GROUP BY 1, 2)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(revc * revc) AS DOUBLE) /
                 (CAST(sum(revc) AS DOUBLE) * sum(revc)), 6) AS hhi
         FROM r GROUP BY nation ORDER BY nation"""
  )
}
