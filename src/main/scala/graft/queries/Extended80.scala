package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 80: distribution-shift and rater-agreement diagnostics —
  * the two numbers a data-curation review board asks for after tp30's
  * calibration bins.
  *
  *  - a37_psi_drift: the Population Stability Index between the two
  *    md5-coin halves of the corpus (t7's engine-portable split, the
  *    same halves a28/a29 drift-test), measured on the tp14/tp30
  *    classifier-score distribution bucketed into the SAME ten
  *    equal-width bins as tp30. Per jointly-populated bin: counts,
  *    shares, and the exact PSI contribution (p_a − p_b)·ln(p_a/p_b).
  *    Contributions are emitted PER BIN (like a29's chi-square terms) so
  *    no cross-bin float sum enters the parity surface; counts are exact
  *    integers from one hash aggregate, each share is one division.
  *    Restricting to bins populated in BOTH halves is the documented
  *    support rule (the usual epsilon hack trades exactness for a
  *    constant; on the joint support the statistic is exact).
  *  - tp32_cohens_kappa: chance-corrected agreement between the truth
  *    labeling (lang = 'en') and the classifier's sign decision
  *    (score ≥ 0), restated so the ONLY division is the terminal one:
  *    κ = (n·agree − S) / (n² − S) with S = posA·posB + negA·negB —
  *    every term an exact BIGINT from the same single aggregate that
  *    feeds tp29's operating points. The marginals and the confusion
  *    quadrants are all in the output, so the κ denominator is
  *    reviewer-checkable by hand.
  *
  * Scale shape: both are one hash aggregate over per-doc scores (the
  * classifier scan is the only corpus-proportional pass; the bin/kappa
  * algebra runs on ≤10 rows). PSI's totals join is a broadcast of a
  * 2-row aggregate. Nothing shuffles more than (bin) or (constant).
  *
  * Reference context: no counterpart; completes the drift family
  * (a28 KS / a29 chi² / a33 KL / a37 PSI) and the evaluation family
  * (a27 AUC / tp29 operating points / tp30 calibration / tp32 κ).
  */
object Extended80 {
  type Q = (SparkSession, String) => DataFrame

  /** t7's md5 coin: first hex digit of md5(doc_id) < '8' → half A. */
  private def halfA: Column =
    (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .cast("long")

  /** Per-doc classifier score with the half flag — the Extended62 kernel
    * (hashed-bigram integer weights, one terminal division) carried with
    * the split coin instead of the label.
    */
  private def scoredHalves(s: SparkSession, d: String): DataFrame = {
    val w = t(s, d, "documents")
      .select(col("doc_id"), halfA.as("in_a"),
        split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 2)
    val g = w.select(col("doc_id"), col("in_a"), explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> concat(words[i], ' ', words[i + 1]))")).as("gram"))
    val iw = conv(substring(md5(col("gram")), 1, 8), 16, 10)
      .cast("long") % 2001L - 1000L
    g.select(col("doc_id"), col("in_a"), iw.as("iw"))
      .groupBy("doc_id", "in_a")
      .agg(count(lit(1)).as("n_feats"), sum(col("iw")).as("siw"))
      .select(col("in_a"),
        (col("siw").cast("double") / (col("n_feats") * 1000L)).as("score"))
  }

  val queries: Map[String, Q] = Map(
    "a37_psi_drift" -> ((s, d) => {
      val sc = scoredHalves(s, d)
      val bin = least(floor((col("score") + lit(1.0)) / 2.0 * 10.0), lit(9.0))
        .cast("long")
      val perBin = sc.select(bin.as("bin"), col("in_a"))
        .groupBy("bin")
        .agg(sum("in_a").as("n_a"),
          sum(lit(1L) - col("in_a")).as("n_b"))
      val tot = perBin.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
      perBin.filter(col("n_a") > 0 && col("n_b") > 0)
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("n_a"), col("n_b"),
          (col("n_a").cast("double") / col("t_a").cast("double")).as("p_a"),
          (col("n_b").cast("double") / col("t_b").cast("double")).as("p_b"))
        .select(col("bin"), col("n_a"), col("n_b"),
          round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
          round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 6)
            .as("psi_term"))
        .orderBy("bin")
    }),

    "tp32_cohens_kappa" -> ((s, d) => {
      val sc = Extended62.classifierScores(s, d)
      val agg = sc.agg(
        count(lit(1)).as("n"),
        sum(when(col("pos") === 1 && col("score") >= 0, 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("pos") === 1 && col("score") < 0, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("pos") === 0 && col("score") >= 0, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("pos") === 0 && col("score") < 0, 1L).otherwise(0L))
          .as("n00"))
      // S = posA·posB + negA·negB; κ = (n·agree − S) / (n² − S) — exact
      // BIGINT numerator and denominator, one terminal division
      val posA = col("n11") + col("n10")
      val negA = col("n01") + col("n00")
      val posB = col("n11") + col("n01")
      val negB = col("n10") + col("n00")
      val sTerm = posA * posB + negA * negB
      val agree = col("n11") + col("n00")
      agg.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n") * agree - sTerm).as("kappa_num"),
        (col("n") * col("n") - sTerm).as("kappa_den"),
        round((col("n") * agree - sTerm).cast("double") /
          (col("n") * col("n") - sTerm).cast("double"), 6).as("kappa"))
    })
  )

  private val scoreCte =
    """w AS (SELECT doc_id, lang, string_split(text, ' ') AS words
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
         SELECT doc_id, lang,
           CAST(sum(iw) AS DOUBLE) / (count(*) * 1000) AS score
         FROM f GROUP BY doc_id, lang)"""

  val oracleSql: Map[String, String] = Map(
    "a37_psi_drift" ->
      s"""WITH $scoreCte,
         b AS (
           SELECT CAST(least(floor((score + 1.0) / 2.0 * 10.0), 9.0) AS BIGINT)
               AS bin,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               THEN 1 ELSE 0 END AS in_a
           FROM sc),
         per AS (
           SELECT bin, CAST(sum(in_a) AS BIGINT) AS n_a,
             CAST(sum(1 - in_a) AS BIGINT) AS n_b
           FROM b GROUP BY bin),
         tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
             CAST(sum(n_b) AS BIGINT) AS t_b FROM per),
         p AS (
           SELECT bin, n_a, n_b,
             CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE) AS p_a,
             CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE) AS p_b
           FROM per CROSS JOIN tot
           WHERE n_a > 0 AND n_b > 0)
         SELECT bin, n_a, n_b, round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
           round((p_a - p_b) * ln(p_a / p_b), 6) AS psi_term
         FROM p ORDER BY bin""",
    "tp32_cohens_kappa" ->
      s"""WITH $scoreCte,
         c AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' AND score >= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n11,
             CAST(sum(CASE WHEN lang = 'en' AND score < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
             CAST(sum(CASE WHEN lang <> 'en' AND score >= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n01,
             CAST(sum(CASE WHEN lang <> 'en' AND score < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n00
           FROM sc)
         SELECT n, n11, n10, n01, n00,
           n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
             + (n01 + n00) * (n10 + n00)) AS kappa_num,
           n * n - ((n11 + n10) * (n11 + n01)
             + (n01 + n00) * (n10 + n00)) AS kappa_den,
           round(CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
               + (n01 + n00) * (n10 + n00)) AS DOUBLE) /
             CAST(n * n - ((n11 + n10) * (n11 + n01)
               + (n01 + n00) * (n10 + n00)) AS DOUBLE), 6) AS kappa
         FROM c"""
  )
}
