package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Dedup

/** Round-7 batch 78: the two curve-level diagnostics a curation pipeline
  * reads before committing to a filter configuration.
  *
  *  - tp30_calibration_bins: the reliability diagram for the tp14/tp29
  *    hashed-bigram classifier — scores mapped affinely to a
  *    pseudo-probability p = (score+1)/2, bucketed into ten equal-width
  *    bins; per bin the doc count, positive count, observed positive
  *    rate, the bin midpoint, and the |observed − midpoint| gap (the
  *    per-bin ECE contribution). Counts are exact integers from ONE
  *    hash aggregate; rate/gap are one division each. A model whose
  *    gaps are large needs recalibration before its threshold (tp29)
  *    can be trusted.
  *  - tp31_dedup_threshold_curve: near-dup retention as a function of
  *    the Jaccard threshold — for t ∈ {0.5 … 0.9}, the count of
  *    LSH-candidate pairs whose EXACT verified 2-gram Jaccard ≥ t and
  *    the docs removed under the greedy keep-lowest-id rule (a doc is
  *    removed iff it is the larger id of some qualifying pair), plus
  *    the retention fraction. The candidate set is the SAME banded
  *    MinHash join the production pipeline uses (never all pairs), and
  *    the oracle replays the signature bit-exactly via minhashSigCtes,
  *    so estimator and curve cannot drift apart. This is the query
  *    that answers "what does moving the dedup threshold cost us?"
  *    before a 100 TB re-shard. (Note the deliberate semantic
  *    difference from dedup_near_pipeline: the curve uses the greedy
  *    pairwise rule — SQL-enumerable per threshold — not per-threshold
  *    connected components.)
  *
  * Scale shape: tp30 is a single hash aggregate over per-doc scores;
  * tp31's pair set is LSH-bucketed (band join), the threshold sweep is
  * a 5-row broadcast cross, and the removal count is a distinct over
  * qualifying pair losers — all shuffle keys are (band, key) or
  * threshold, nothing quadratic in the corpus.
  *
  * Reference context: no counterpart; extends the evaluation layer
  * (a27 AUC → tp29 operating points → tp30 calibration) and the dedup
  * family (dedup_minhash_lsh / dedup_near_pipeline → tp31 curve).
  */
object Extended78 {
  type Q = (SparkSession, String) => DataFrame

  private val Thresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  val queries: Map[String, Q] = Map(
    "tp30_calibration_bins" -> ((s, d) => {
      val sc = Extended62.classifierScores(s, d)
      val p = (col("score") + lit(1.0)) / lit(2.0)
      val bin = least(floor(p * lit(10.0)), lit(9.0)).cast("long")
      sc.select(bin.as("bin"), col("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
        .select(col("bin"), col("n"), col("n_pos"),
          ((lit(2L) * col("bin") + 1L).cast("double") / 20.0).as("bin_mid"),
          round(col("n_pos").cast("double") / col("n").cast("double"), 6)
            .as("obs_rate"),
          round(abs(col("n_pos").cast("double") / col("n").cast("double") -
            (lit(2L) * col("bin") + 1L).cast("double") / 20.0), 6).as("gap"))
        .orderBy("bin")
    }),

    "tp31_dedup_threshold_curve" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // LSH candidates verified at the lowest swept threshold once; the
      // sweep itself is a broadcast cross + one grouped aggregate
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = Thresholds.min)
      val th = s.range(1)
        .select(explode(array(Thresholds.map(lit): _*)).as("threshold"))
      val perTh = pairs.crossJoin(broadcast(th))
        .filter(col("jaccard") >= col("threshold"))
        .groupBy("threshold")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("b")).as("n_removed"))
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      th.join(perTh, Seq("threshold"), "left")
        .na.fill(0L, Seq("n_pairs", "n_removed"))
        .crossJoin(broadcast(tot))
        .select(col("threshold"), col("n_pairs"), col("n_removed"),
          round((col("n_docs") - col("n_removed")).cast("double") /
            col("n_docs").cast("double"), 6).as("retention"))
        .orderBy("threshold")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp30_calibration_bins" ->
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words
             FROM documents),
         g AS (
           SELECT doc_id, lang, words[i+1] || ' ' || words[i+2] AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 1)) AS i) r
           WHERE len(words) >= 2),
         f AS (
           SELECT doc_id, lang,
             CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 2001 - 1000 AS iw
           FROM g),
         sc AS (
           SELECT CAST(sum(iw) AS DOUBLE) / (count(*) * 1000) AS score,
             CAST(lang = 'en' AS BIGINT) AS pos
           FROM f GROUP BY doc_id, lang),
         b AS (
           SELECT CAST(least(floor((score + 1.0) / 2.0 * 10.0), 9.0) AS BIGINT)
               AS bin, pos
           FROM sc),
         agg AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
           FROM b GROUP BY bin)
         SELECT bin, n, n_pos,
           CAST(2 * bin + 1 AS DOUBLE) / 20.0 AS bin_mid,
           round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_rate,
           round(abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) -
             CAST(2 * bin + 1 AS DOUBLE) / 20.0), 6) AS gap
         FROM agg ORDER BY bin""",
    "tp31_dedup_threshold_curve" -> {
      val values = Thresholds.mkString(", ")
      s"""WITH ${LlmQueries.minhashSigCtes},
         cand AS (
           SELECT DISTINCT x1.doc_id AS a, x2.doc_id AS b
           FROM kb x1 JOIN kb x2
             ON x1.band = x2.band AND x1.key = x2.key AND x1.doc_id < x2.doc_id),
         ver AS (
           SELECT cand.a, cand.b,
             CASE WHEN len(ga.grams) + len(gb.grams) = 0 THEN 1.0
               ELSE len(list_intersect(ga.grams, gb.grams)) /
                 CAST(len(ga.grams) + len(gb.grams)
                      - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
               END AS jaccard
           FROM cand
             JOIN g ga ON ga.doc_id = cand.a
             JOIN g gb ON gb.doc_id = cand.b),
         th AS (SELECT CAST(unnest([$values]) AS DOUBLE) AS threshold),
         per AS (
           SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT b) AS BIGINT) AS n_removed
           FROM ver CROSS JOIN th
           WHERE jaccard >= threshold
           GROUP BY threshold),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         SELECT threshold, coalesce(n_pairs, 0) AS n_pairs,
           coalesce(n_removed, 0) AS n_removed,
           round(CAST(n_docs - coalesce(n_removed, 0) AS DOUBLE) /
             CAST(n_docs AS DOUBLE), 6) AS retention
         FROM th LEFT JOIN per USING (threshold) CROSS JOIN tot
         ORDER BY threshold"""
    }
  )
}
