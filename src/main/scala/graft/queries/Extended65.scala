package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Coreset

/** Round-7 batch 65: diversity selection and corpus-novelty signals.
  *
  *  - tp25_kcenter_coreset: greedy k-center exemplar selection over the
  *    embedding table ([[graft.llm.Coreset]]) — k scans, each folding
  *    the newest broadcast center into a running min-distance with
  *    `least(...)` and taking the argmax as TakeOrdered(1). The oracle
  *    unrolls the same five rounds as chained CTEs over the
  *    [[OracleSql.cosExact]] fold, so every distance comparison is the
  *    identical IEEE sequence (never DuckDB's own
  *    `list_cosine_similarity`, whose accumulation order is unpinned).
  *  - t24_ngram_novelty: per-document novelty — the fraction of a doc's
  *    word-3-gram positions whose gram has never appeared in any
  *    EARLIER document (first occurrence = min(doc_id), the tp13/t23
  *    charging rule at n-gram level). High-novelty late documents are
  *    the memorization-risk/quality outliers curation pipelines flag;
  *    the plan is one explode + two hash aggregates, no pair join, no
  *    window.
  *
  * Reference context: no counterpart in the reference; extends the
  * tp- (selection) and t- (corpus statistics) layers.
  */
object Extended65 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp25: greedy k-center coreset (k = 5, seed = vec 1) ----
    "tp25_kcenter_coreset" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      Coreset.kCenterGreedy(s, e, "vec_id", "embedding", k = 5, seedId = 1L)
        .withColumnRenamed("id", "vec_id")
        .orderBy("round")
    }),

    // ---- t24: per-doc first-occurrence n-gram novelty ----
    "t24_ngram_novelty" -> ((s, d) => {
      val n = 3
      val w = graft.operators.Par.fanOut(
          t(s, d, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= n)
      val g = w.select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(words) - $n), " +
            s"i -> concat_ws(' ', slice(words, i + 1, $n)))")).as("gram"))
      val firsts = g.groupBy("gram").agg(min("doc_id").as("fd"))
      g.join(firsts, Seq("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_grams"),
          sum((col("doc_id") === col("fd")).cast("long")).as("novel_grams"))
        .select(col("doc_id"), col("total_grams"), col("novel_grams"),
          (col("novel_grams").cast("double") /
            col("total_grams").cast("double")).as("novelty"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp25_kcenter_coreset" -> {
      // distance restated with the repo's cosExact fold (dot /
      // (sqrt(aa)*sqrt(bb)), left-to-right accumulation) — the same IEEE
      // sequence Similarity.cosine runs, as the ANN oracles pin it.
      // DuckDB's list_cosine_similarity may accumulate differently, and a
      // near-tie at another scale could then flip the selected center.
      // centers enter each round as a CROSS-JOINed 1-row column (cv), not
      // a scalar subquery: the cosExact list_transform lambda cannot
      // reference a subquery (DuckDB restriction)
      val dist = (v: String, c: String) =>
        s"1 - ${OracleSql.cosExact(v, c)}"
      s"""WITH e AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id <> 0),
         d1 AS (SELECT id, v, ${dist("v", "cv")} AS md
             FROM e CROSS JOIN (SELECT v AS cv FROM e WHERE id = 1)),
         c2 AS (SELECT id, v FROM d1 ORDER BY md DESC, id LIMIT 1),
         d2 AS (SELECT id, v, least(md, ${dist("v", "cv")}) AS md
             FROM d1 CROSS JOIN (SELECT v AS cv FROM c2)),
         c3 AS (SELECT id, v FROM d2 ORDER BY md DESC, id LIMIT 1),
         d3 AS (SELECT id, v, least(md, ${dist("v", "cv")}) AS md
             FROM d2 CROSS JOIN (SELECT v AS cv FROM c3)),
         c4 AS (SELECT id, v FROM d3 ORDER BY md DESC, id LIMIT 1),
         d4 AS (SELECT id, v, least(md, ${dist("v", "cv")}) AS md
             FROM d3 CROSS JOIN (SELECT v AS cv FROM c4)),
         c5 AS (SELECT id, v FROM d4 ORDER BY md DESC, id LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS round, CAST(1 AS BIGINT) AS vec_id
         UNION ALL SELECT 2, (SELECT id FROM c2)
         UNION ALL SELECT 3, (SELECT id FROM c3)
         UNION ALL SELECT 4, (SELECT id FROM c4)
         UNION ALL SELECT 5, (SELECT id FROM c5)
         ORDER BY round"""
    },
    "t24_ngram_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
             FROM documents),
         g AS (
           SELECT doc_id, array_to_string(words[i+1:i+3], ' ') AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 2)) AS i) r
           WHERE len(words) >= 3),
         fd AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
         SELECT g.doc_id, count(*) AS total_grams,
           CAST(count(*) FILTER (WHERE g.doc_id = fd.fd) AS BIGINT)
             AS novel_grams,
           CAST(count(*) FILTER (WHERE g.doc_id = fd.fd) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty
         FROM g JOIN fd ON g.gram = fd.gram
         GROUP BY g.doc_id ORDER BY g.doc_id"""
  )
}
