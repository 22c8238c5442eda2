package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-6 surface extensions, batch 40: substring-level dedup signal,
  * learned-classifier inference as a join, and scalar-quantization ANN.
  *
  *  - tp13: EXACT duplicated word-n-gram spans (the Lee et al. 2022
  *    "Deduplicating Training Data" substring discipline, at word-5-gram
  *    granularity): every 5-gram position whose gram occurs in ≥ 2
  *    distinct documents is a duplicated span. Doc-level dedup
  *    (dedup_exact/minhash/simhash) cannot see these — a document that is
  *    20% boilerplate survives doc-level dedup with the boilerplate
  *    intact; this query measures exactly that residue per document.
  *    Scale shape: explode to (gram, doc, pos) skinny rows; one shuffle
  *    on gram for the distinct-doc count (grams are near-unique, so the
  *    key space is huge and balanced — no skew); one shuffle on doc_id
  *    for the per-doc rollup. At 100 TB the dup-gram relation is the
  *    stored artifact and the rollup is incremental.
  *  - tp14: fastText-style linear classifier INFERENCE over hashed
  *    bigram features — the "model application at scale" shape: features
  *    are hashed (md5-prefix, engine-portable), the weight of a feature
  *    is a pure function of its hash (standing in for a trained weight
  *    table; at scale the weights would be a broadcast join against a
  *    few-MB parquet of trained weights, same plan shape), and the score
  *    is the mean feature weight. The sum runs over INTEGER weight
  *    numerators (hv % 2001 − 1000) so the distributed sum commutes
  *    exactly; the single double division per doc is engine-identical.
  *    The sigmoid is monotone, so the decision label and any ranking are
  *    taken on the logit directly — no exp() in the parity surface.
  *  - ann_sq8_topk: scalar-quantization ANN (see [[Similarity.sq8TopK]])
  *    — completes the ANN family (brute / LSH / IVF / PQ / SQ8).
  */
object Extended40 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp13: duplicated word-5-gram spans per document ----
    "tp13_dup_ngram_spans" -> ((s, d) => {
      val n = 5
      val w = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= n)
      val g = w.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(words) - $n), " +
            s"i -> concat_ws(' ', slice(words, i + 1, $n)))"))
          .as(Seq("pos", "gram")))
      val dup = g.groupBy("gram")
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("gram"), lit(1L).as("isdup"))
      g.join(dup, Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_grams"),
          sum(coalesce(col("isdup"), lit(0L))).as("dup_grams"))
        .withColumn("dup_frac", round(col("dup_grams") / col("total_grams"), 4))
        .orderBy("doc_id")
    }),

    // ---- tp14: hashed-bigram linear classifier inference ----
    "tp14_classifier_inference" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
      // 0-based subscripts on the Spark side == words[i+1]/words[i+2]
      // 1-based on the DuckDB side
      val g = w.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 2), " +
            "i -> concat(words[i], ' ', words[i + 1]))")).as("gram"))
      // integer weight numerator from the feature hash: exact under any
      // combine order (the double weight (iw/1000) never enters a
      // distributed sum)
      val iw = conv(substring(md5(col("gram")), 1, 8), 16, 10)
        .cast("long") % 2001L - 1000L
      g.select(col("doc_id"), iw.as("iw"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("iw")).as("siw"))
        // UNROUNDED score: the numerator is an exact integer sum and the
        // single division is the same IEEE op on both engines, so the
        // double is bit-identical; round(·, 4) would instead sit exactly
        // on half-way points (k/1000n) where Spark's BigDecimal half-up
        // and DuckDB's raw-double rounding disagree
        .select(col("doc_id"), col("n_feats"),
          (col("siw").cast("double") / (col("n_feats") * 1000L)).as("score"),
          (col("siw") >= 0).cast("int").as("label"))
        .orderBy("doc_id")
    }),

    // ---- ann_sq8_topk: scalar-quantization ANN ----
    "ann_sq8_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head.getSeq[Float](0).map(_.toDouble)
      Similarity.sq8TopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        qv, 10, refine = 50)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    })
  )

  private val cosExact = (a: String, b: String) =>
    s"list_cosine_similarity($a, $b)"

  val oracleSql: Map[String, String] = Map(
    "tp13_dup_ngram_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         g AS (
           SELECT doc_id, i AS pos, array_to_string(words[i+1:i+5], ' ') AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 4)) AS i) r
           WHERE len(words) >= 5),
         dg AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
         SELECT doc_id, count(*) AS total_grams,
           count(*) FILTER (WHERE gram IN (SELECT gram FROM dg)) AS dup_grams,
           round(count(*) FILTER (WHERE gram IN (SELECT gram FROM dg)) * 1.0
             / count(*), 4) AS dup_frac
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    "tp14_classifier_inference" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         g AS (
           SELECT doc_id, words[i+1] || ' ' || words[i+2] AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 1)) AS i) r
           WHERE len(words) >= 2),
         f AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 2001 - 1000 AS iw
           FROM g)
         SELECT doc_id, count(*) AS n_feats,
           CAST(sum(iw) AS DOUBLE) / (count(*) * 1000) AS score,
           CAST(sum(iw) >= 0 AS INT) AS label
         FROM f GROUP BY doc_id ORDER BY doc_id""",
    "ann_sq8_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         dims AS (
           SELECT i, min(v[i]) AS mn, max(v[i]) - min(v[i]) AS span
           FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r
           WHERE vec_id <> 0 GROUP BY i),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         codes AS (
           SELECT vec_id, v,
             list(CASE WHEN span > 0 THEN least(255, greatest(0,
               floor((v[i] - mn) / span * 256))) ELSE 0 END ORDER BY i) AS code
           FROM e, dims WHERE vec_id <> 0 GROUP BY vec_id, v),
         qcode AS (
           SELECT list(CASE WHEN span > 0 THEN least(255, greatest(0,
               floor((qv[i] - mn) / span * 256))) ELSE 0 END ORDER BY i) AS qc
           FROM q, dims),
         cand AS (
           SELECT vec_id, v,
             list_aggregate(list_transform(range(1, len(code) + 1),
               i -> (code[i] - qc[i]) * (code[i] - qc[i])), 'sum') AS qd
           FROM codes, qcode
           ORDER BY qd, vec_id LIMIT 50)
         SELECT c.vec_id, round(${cosExact("c.v", "q.qv")}, 4) AS sim
         FROM cand c, q
         ORDER BY ${cosExact("c.v", "q.qv")} DESC, c.vec_id LIMIT 10"""
  )
}
