package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Text

/** Round-7 batch 71: tokenizer-planning and information-drift signals.
  *
  *  - tp27_tokenizer_fertility: per-language fertility of the BPE-ish
  *    subword tokenizer (t6's `Text.approxBpeCount`) — subword units per
  *    whitespace word, the metric that decides whether a tokenizer is
  *    viable for a language (fertility ≫ 1 → the language pays more
  *    sequence length per word). Exact integer token totals per
  *    language, ONE division each; the per-doc fold is the same
  *    left-assoc `aggregate` both engines share via t6.
  *  - a33_kl_drift: Kullback–Leibler divergence (both directions, plus
  *    per-language contributions) of the language distribution between
  *    the md5-split corpus halves — completing the drift family (a28 KS
  *    for numeric, a29 χ² for counts, a33 KL for information loss).
  *    Probabilities are exact integer ratios; each contribution is
  *    p·ln(p/q) with the SAME IEEE ln both engines use (the t20
  *    precedent), emitted PER LANGUAGE so no cross-language float sum
  *    enters the parity surface.
  *
  * Reference context: no counterpart; extends tp- (tokenization) and a-
  * (drift) families.
  */
object Extended71 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp27: per-language tokenizer fertility ----
    "tp27_tokenizer_fertility" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("lang"),
          Text.tokenCount(col("text")).cast("long").as("nw"),
          Text.approxBpeCount(col("text")).as("nb"))
        .groupBy("lang")
        .agg(sum("nw").as("words"), sum("nb").as("subwords"))
        .select(col("lang"), col("words"), col("subwords"),
          (col("subwords").cast("double") / col("words").cast("double"))
            .as("fertility"))
        .orderBy("lang")
    }),

    // ---- a33: per-language KL drift between md5-split halves ----
    "a33_kl_drift" -> ((s, d) => {
      val o = t(s, d, "documents")
        .select(col("lang"),
          (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
            < "8").cast("long").as("a"))
        .groupBy("lang")
        .agg(sum("a").as("ca"), sum(lit(1L) - col("a")).as("cb"))
      val tot = o.agg(sum("ca").as("na"), sum("cb").as("nb"))
      o.crossJoin(broadcast(tot))
        .select(col("lang"), col("ca"), col("cb"),
          { val p = col("ca").cast("double") / col("na").cast("double")
            val q = col("cb").cast("double") / col("nb").cast("double")
            (p * log(p / q)).as("kl_ab") },
          { val p = col("ca").cast("double") / col("na").cast("double")
            val q = col("cb").cast("double") / col("nb").cast("double")
            (q * log(q / p)).as("kl_ba") })
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp27_tokenizer_fertility" ->
      """WITH m AS (
           SELECT lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS nw,
             CAST(list_aggregate(list_transform(
               regexp_split_to_array(trim(text), '\s+'),
               w -> greatest(CAST(ceil(length(w)/4.0) AS BIGINT), 1)),
               'sum') AS BIGINT) AS nb
           FROM documents)
         SELECT lang, CAST(sum(nw) AS BIGINT) AS words,
           CAST(sum(nb) AS BIGINT) AS subwords,
           CAST(sum(nb) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) AS fertility
         FROM m GROUP BY lang ORDER BY lang""",
    "a33_kl_drift" ->
      """WITH o AS (
           SELECT lang,
             CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               < '8' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               < '8' THEN 0 ELSE 1 END) AS BIGINT) AS cb
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb FROM o)
         SELECT lang, ca, cb,
           (CAST(ca AS DOUBLE) / na) * ln((CAST(ca AS DOUBLE) / na)
             / (CAST(cb AS DOUBLE) / nb)) AS kl_ab,
           (CAST(cb AS DOUBLE) / nb) * ln((CAST(cb AS DOUBLE) / nb)
             / (CAST(ca AS DOUBLE) / na)) AS kl_ba
         FROM o, tot ORDER BY lang"""
  )
}
