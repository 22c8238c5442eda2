package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 surface extensions, batch 58: tokenizer-construction and
  * rarity-based quality signals over the documents corpus.
  * (PII scrubbing already exists as t14_pii_redact in batch 9.)
  *
  *  - t22: BPE MERGE CANDIDATES — the first step of byte-pair-encoding
  *    vocabulary induction: count every adjacent character pair inside
  *    words across the corpus and rank the top merges. One explode →
  *    pair-keyed partial agg → TakeOrdered; the pair domain is bounded
  *    (alphabet²), so state never follows corpus size — the same
  *    histogram discipline as the a19 family. Words shorter than 2
  *    chars are filtered BEFORE the pair generator (Spark's
  *    `sequence(1, 0)` would generate a descending range, not an empty
  *    one — the guard is load-bearing).
  *  - tp20: WORD-RARITY quality score (the exact-arithmetic stand-in
  *    for a unigram-LM perplexity filter, CCNet-style): per document,
  *    the mean INVERSE unigram frequency T/c(w) of its words. Every
  *    per-word value is one IEEE division (correctly rounded, identical
  *    both engines — deliberately NO transcendentals in the parity
  *    surface, the tp14 discipline), and the per-doc mean folds over
  *    the ASCENDING-SORTED value list on both engines, so the double
  *    sum is bit-identical (the r8_harmonic trick). High score = rare
  *    vocabulary; the downstream filter drops the tails.
  */
object Extended58 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- t22: top adjacent-char-pair merge candidates ----
    "t22_bpe_merges" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)),

    // ---- tp20: mean inverse-frequency rarity per document ----
    "tp20_word_rarity" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
      val cnt = words.groupBy("w").agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum("c").as("tw"))
      words.join(cnt, "w").crossJoin(broadcast(tot))
        .select(col("doc_id"),
          (col("tw").cast("double") / col("c").cast("double")).as("inv"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("inv"))).as("invs"),
          count(lit(1)).as("n_words"))
        .select(col("doc_id"), col("n_words"),
          round(expr("aggregate(invs, cast(0.0 as double), (a, x) -> a + x)")
            / col("n_words"), 4).as("rarity"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t22_bpe_merges" ->
      """WITH w AS (
           SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
           FROM documents),
         p AS (
           SELECT unnest([substring(w, i, 2) for i in range(1, length(w))]) AS pair
           FROM w WHERE length(w) >= 2)
         SELECT pair, count(*) AS n FROM p
         GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",
    "tp20_word_rarity" ->
      """WITH words AS (
           SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
           FROM documents),
         w2 AS (SELECT doc_id, w FROM words WHERE length(w) > 0),
         cnt AS (SELECT w, count(*) AS c FROM w2 GROUP BY w),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS tw FROM cnt),
         inv AS (
           SELECT w2.doc_id,
             CAST(tot.tw AS DOUBLE) / CAST(cnt.c AS DOUBLE) AS inv
           FROM w2 JOIN cnt ON w2.w = cnt.w CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_words,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_sort(list(inv))), (a, x) -> a + x) / count(*), 4)
             AS rarity
         FROM inv GROUP BY doc_id ORDER BY doc_id"""
  )
}
