package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 111: rater-agreement tests and the calibration
  * decomposition — the three classical instruments for comparing
  * FILTERS (not just scoring one, which tp29/tp30/tp32 already do).
  *
  *  - a57_mcnemar: McNemar's paired test between two document-quality
  *    rules over the SAME corpus (the length gate vs the top-word-share
  *    gate, both from tp36's integer-cross-product boundaries). The
  *    entire statistic lives on the discordant counts: χ² =
  *    (|b−c|−1)²/(b+c) with continuity correction — exact BIGINTs, ONE
  *    division. This is the "did changing the filter actually change
  *    outcomes?" test run before swapping curation rules.
  *  - a58_cochran_q: Cochran's Q across THREE rules at once (adds the
  *    mean-word-length gate) — the k-rater generalization. Written on
  *    the integer identity Q = (k−1)·Σ_j(k·T_j − S)² / (k·(k·S − Σu²)):
  *    column totals T_j, grand total S and the per-doc row-sum squares
  *    Σu² all come from ONE aggregate over per-doc flags; the 3-term
  *    numerator sum is a fixed expression (no cross-row float fold).
  *  - tp40_brier_decomposition: Murphy's reliability/resolution/
  *    uncertainty decomposition of the BINNED Brier score for the
  *    shared tp14 hashed-bigram classifier, over tp30's ten
  *    equal-width bins with the bin midpoint as forecast. Per-bin
  *    contributions use exact-integer numerators —
  *    REL_k = ((2k+1)·n_k − 20·o_k)² / (400·n_k),
  *    RES_k = (o_k·N − O·n_k)² / (n_k·N²) — one division each, folded
  *    in bin order on BOTH engines; UNC = O·(N−O)/N²; and the score
  *    reassembles as BRIER = REL − RES + UNC (the identity holds
  *    exactly for binned forecasts, so the output is self-checking).
  *
  * Scale shape: all three are explode → doc-keyed hash aggregate →
  * ONE global aggregate (a57/a58) or a ten-row bin summary (tp40);
  * nothing quadratic, no windows, no driver state.
  *
  * Reference context: no counterpart; extends the evaluation layer
  * (a27 AUC, tp29 sweep, tp30 calibration, tp32 kappa).
  */
object Extended111 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-doc rule flags (tp36's integer-cross-product boundaries):
    * a = word count in [20, 1000]; b = top-word share < 0.2;
    * c = mean word length in [2, 12]. Emitted as 0/1 longs.
    */
  private def ruleFlags(s: SparkSession, d: String): DataFrame = {
    val words = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("c"), sum(length(col("word"))).as("chars"))
      .groupBy("doc_id")
      .agg(max("c").as("maxw"), sum("c").as("nw"), sum("chars").as("nc"))
    words.select(col("doc_id"),
      (col("nw") >= 20 && col("nw") <= 1000).cast("long").as("fa"),
      (lit(5) * col("maxw") < col("nw")).cast("long").as("fb"),
      (col("nc") >= lit(2) * col("nw") &&
        col("nc") <= lit(12) * col("nw")).cast("long").as("fc"))
  }

  val queries: Map[String, Q] = Map(
    // ---- a57: McNemar's paired test, length gate vs top-word gate ----
    "a57_mcnemar" -> ((s, d) => {
      val f = ruleFlags(s, d)
      f.agg(
          sum(col("fa") * col("fb")).as("n11"),
          sum(col("fa") * (lit(1L) - col("fb"))).as("n10"),
          sum((lit(1L) - col("fa")) * col("fb")).as("n01"),
          sum((lit(1L) - col("fa")) * (lit(1L) - col("fb"))).as("n00"))
        .select(col("n11"), col("n10"), col("n01"), col("n00"),
          round(when(col("n10") + col("n01") === 0L, lit(0.0)).otherwise(
            ((abs(col("n10") - col("n01")) - 1L) *
              (abs(col("n10") - col("n01")) - 1L)).cast("double") /
              (col("n10") + col("n01")).cast("double")), 6).as("chi2"))
    }),

    // ---- a58: Cochran's Q across three quality rules ----
    "a58_cochran_q" -> ((s, d) => {
      val f = ruleFlags(s, d)
        .withColumn("u", col("fa") + col("fb") + col("fc"))
      f.agg(
          count(lit(1)).as("n_docs"),
          sum("fa").as("ta"), sum("fb").as("tb"), sum("fc").as("tc"),
          sum("u").as("ss"), sum(col("u") * col("u")).as("su2"))
        .select(col("n_docs"), col("ta"), col("tb"), col("tc"),
          { // Q = (k−1)·Σ_j(k·T_j − S)² / (k·(k·S − Σu²)), k = 3
            val nA = lit(3L) * col("ta") - col("ss")
            val nB = lit(3L) * col("tb") - col("ss")
            val nC = lit(3L) * col("tc") - col("ss")
            val num = dec(lit(2L)) * (dec(nA) * dec(nA) + dec(nB) * dec(nB)
              + dec(nC) * dec(nC))
            val den = dec(lit(3L)) *
              (dec(lit(3L)) * dec(col("ss")) - dec(col("su2")))
            round(num.cast("double") / den.cast("double"), 6).as("q_stat") })
    }),

    // ---- tp40: Murphy decomposition of the binned Brier score ----
    "tp40_brier_decomposition" -> ((s, d) => {
      val sc = Extended62.classifierScores(s, d)
      val p = (col("score") + lit(1.0)) / lit(2.0)
      val bin = least(floor(p * lit(10.0)), lit(9.0)).cast("long")
      val bins = sc.select(bin.as("bin"), col("pos"))
        .groupBy("bin").agg(count(lit(1)).as("nk"), sum("pos").as("ok"))
      val tot = bins.agg(sum("nk").as("n"), sum("ok").as("o"))
      // per-bin exact-integer numerators; one division each, folded in
      // bin order on both engines (ten terms)
      val terms = bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("o"),
          { val relNum = (lit(2L) * col("bin") + 1L) * col("nk") -
              lit(20L) * col("ok")
            ((dec(relNum) * dec(relNum)).cast("double") /
              (lit(400L) * col("nk")).cast("double")).as("rel_t") },
          { val resNum = col("ok") * col("n") - col("o") * col("nk")
            ((dec(resNum) * dec(resNum)).cast("double") /
              (dec(col("nk")) * dec(col("n")) * dec(col("n")))
                .cast("double")).as("res_t") })
      terms.groupBy("n", "o")
        .agg(
          aggregate(sort_array(collect_list(struct(col("bin"),
              col("rel_t"), col("res_t")))),
            struct(lit(0.0).as("rel"), lit(0.0).as("res")),
            (acc, x) => struct((acc("rel") + x("rel_t")).as("rel"),
              (acc("res") + x("res_t")).as("res"))).as("f"))
        .select(col("n"),
          { val rel = col("f.rel") / col("n").cast("double")
            val res = col("f.res") / col("n").cast("double")
            val unc = (dec(col("o")) * dec(col("n") - col("o")))
              .cast("double") /
              (dec(col("n")) * dec(col("n"))).cast("double")
            struct(round(rel, 6).as("reliability"),
              round(res, 6).as("resolution"),
              round(unc, 6).as("uncertainty"),
              round(rel - res + unc, 6).as("brier")) }.as("m"))
        .select(col("n"), col("m.reliability").as("reliability"),
          col("m.resolution").as("resolution"),
          col("m.uncertainty").as("uncertainty"), col("m.brier").as("brier"))
    })
  )

  val oracleSql: Map[String, String] = {
    val flagsCte =
      """w AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         perword AS (
           SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(length(word)) AS BIGINT) AS chars
           FROM w GROUP BY doc_id, word),
         perdoc AS (
           SELECT doc_id, max(c) AS maxw, CAST(sum(c) AS BIGINT) AS nw,
             CAST(sum(chars) AS BIGINT) AS nc
           FROM perword GROUP BY doc_id),
         flags AS (
           SELECT doc_id,
             CAST(nw >= 20 AND nw <= 1000 AS BIGINT) AS fa,
             CAST(5 * maxw < nw AS BIGINT) AS fb,
             CAST(nc >= 2 * nw AND nc <= 12 * nw AS BIGINT) AS fc
           FROM perdoc)"""
    Map(
      "a57_mcnemar" ->
        s"""WITH $flagsCte
           SELECT CAST(sum(fa * fb) AS BIGINT) AS n11,
             CAST(sum(fa * (1 - fb)) AS BIGINT) AS n10,
             CAST(sum((1 - fa) * fb) AS BIGINT) AS n01,
             CAST(sum((1 - fa) * (1 - fb)) AS BIGINT) AS n00,
             round(CASE WHEN sum(fa * (1 - fb)) + sum((1 - fa) * fb) = 0
               THEN CAST(0 AS DOUBLE)
               ELSE CAST((abs(sum(fa * (1 - fb)) - sum((1 - fa) * fb)) - 1)
                   * (abs(sum(fa * (1 - fb)) - sum((1 - fa) * fb)) - 1)
                   AS DOUBLE)
                 / CAST(sum(fa * (1 - fb)) + sum((1 - fa) * fb) AS DOUBLE)
               END, 6) AS chi2
           FROM flags""",
      "a58_cochran_q" ->
        s"""WITH $flagsCte,
           agg AS (
             SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(fa) AS BIGINT) AS ta, CAST(sum(fb) AS BIGINT) AS tb,
               CAST(sum(fc) AS BIGINT) AS tc,
               CAST(sum(fa + fb + fc) AS BIGINT) AS ss,
               CAST(sum((fa + fb + fc) * (fa + fb + fc)) AS BIGINT) AS su2
             FROM flags)
           SELECT n_docs, ta, tb, tc,
             round(CAST(2 * (CAST(3 * ta - ss AS HUGEINT) * (3 * ta - ss)
                 + CAST(3 * tb - ss AS HUGEINT) * (3 * tb - ss)
                 + CAST(3 * tc - ss AS HUGEINT) * (3 * tc - ss)) AS DOUBLE)
               / CAST(3 * (CAST(3 AS HUGEINT) * ss - su2) AS DOUBLE), 6)
               AS q_stat
           FROM agg""",
      "tp40_brier_decomposition" ->
        s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words
             FROM documents),
           g AS (
             SELECT doc_id, lang, words[i+1] || ' ' || words[i+2] AS gram
             FROM w, LATERAL (SELECT unnest(range(0, len(words) - 1)) AS i) r
             WHERE len(words) >= 2),
           f AS (
             SELECT doc_id, lang,
               CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 2001 - 1000
                 AS iw
             FROM g),
           sc AS (
             SELECT CAST(sum(iw) AS DOUBLE) / (count(*) * 1000) AS score,
               CAST(lang = 'en' AS BIGINT) AS pos
             FROM f GROUP BY doc_id, lang),
           binned AS (
             SELECT CAST(least(floor((score + 1.0) / 2.0 * 10.0), 9.0)
               AS BIGINT) AS bin, pos
             FROM sc),
           bins AS (
             SELECT bin, CAST(count(*) AS BIGINT) AS nk,
               CAST(sum(pos) AS BIGINT) AS ok
             FROM binned GROUP BY bin),
           tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
                          CAST(sum(ok) AS BIGINT) AS o FROM bins),
           terms AS (
             SELECT bin, n, o,
               CAST(CAST((2 * bin + 1) * nk - 20 * ok AS HUGEINT)
                   * ((2 * bin + 1) * nk - 20 * ok) AS DOUBLE)
                 / CAST(400 * nk AS DOUBLE) AS rel_t,
               CAST(CAST(ok * n - o * nk AS HUGEINT)
                   * (ok * n - o * nk) AS DOUBLE)
                 / CAST(CAST(nk AS HUGEINT) * n * n AS DOUBLE) AS res_t
             FROM bins, tot),
           folded AS (
             SELECT n, o,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(rel_t ORDER BY bin)), (a, b) -> a + b) AS rel_s,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(res_t ORDER BY bin)), (a, b) -> a + b) AS res_s
             FROM terms GROUP BY n, o)
           SELECT n,
             round(rel_s / CAST(n AS DOUBLE), 6) AS reliability,
             round(res_s / CAST(n AS DOUBLE), 6) AS resolution,
             round(CAST(CAST(o AS HUGEINT) * (n - o) AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) AS uncertainty,
             round(rel_s / CAST(n AS DOUBLE) - res_s / CAST(n AS DOUBLE)
               + CAST(CAST(o AS HUGEINT) * (n - o) AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) AS brier
           FROM folded"""
    )
  }
}
