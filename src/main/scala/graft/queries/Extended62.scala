package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-7 batch 62: model-evaluation and distribution-drift statistics —
  * the "is my filter/classifier/split any good" layer a training-data
  * pipeline runs after tp14-style inference and t7-style splitting.
  *
  *  - a27_auc: EXACT ROC AUC of the tp14 hashed-bigram classifier
  *    (Extended40.scala:65) against a reference label (lang == 'en'),
  *    via the Mann–Whitney U identity with midrank tie handling:
  *    AUC = Σ_s pc(s)·(2·negBelow(s) + nc(s)) / (2·P·N). The rank-below
  *    table is the classic single-partition `sum OVER (ORDER BY score)`
  *    hazard — here it runs through [[graft.operators.PrefixSum]]'s
  *    two-level scan, so no reducer ever sees the whole score domain.
  *    Every term is an exact BIGINT until the one final division (u2 is
  *    emitted so the parity check covers the integer surface; longs
  *    carry corpora to ~10^9 docs — past that the same plan runs on
  *    decimal(38)).
  *  - a28_ks_drift: two-sample Kolmogorov–Smirnov statistic between the
  *    md5-split halves of the corpus (the t7 split discipline,
  *    Extended.scala:100) over the n_chars distribution — the standard
  *    "did my train/val split drift" check. D = max |ECDF_A − ECDF_B|
  *    is computed as max |cumA·nB − cumB·nA| in exact integers (one
  *    division at the end), with both ECDFs from one PrefixSum pass.
  *  - a29_chi2_drift: per-language chi-square drift contributions
  *    between the same halves. Each contribution is restated as
  *    (o·n − rowTot·colTot)² / (n·rowTot·colTot) — integer numerator,
  *    ONE division — and emitted per language (no cross-language double
  *    sum enters the parity surface, so combine order cannot bite).
  *
  * Reference context: the reference has no evaluation surface; these
  * extend the training-pipeline layer (tp14 inference → a27 eval,
  * t7 split → a28/a29 drift) like tp1-tp23.
  */
object Extended62 {
  type Q = (SparkSession, String) => DataFrame

  /** t7's engine-portable coin flip: md5 hex digit < '8' → half A. */
  private def inA: Column =
    (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .cast("long")

  /** tp14's per-doc classifier score (exact integer numerator, one
    * engine-identical division), carried with the doc's language.
    */
  private[graft] def classifierScores(s: SparkSession, d: String): DataFrame = {
    val w = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 2)
    val g = w.select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> concat(words[i], ' ', words[i + 1]))")).as("gram"))
    val iw = conv(substring(md5(col("gram")), 1, 8), 16, 10)
      .cast("long") % 2001L - 1000L
    g.select(col("doc_id"), col("lang"), iw.as("iw"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"), sum(col("iw")).as("siw"))
      .select(
        (col("siw").cast("double") / (col("n_feats") * 1000L)).as("score"),
        (col("lang") === "en").cast("long").as("pos"))
  }

  val queries: Map[String, Q] = Map(
    // ---- a27: exact ROC AUC via Mann–Whitney with midranks ----
    "a27_auc" -> ((s, d) => {
      val h = classifierScores(s, d)
        .groupBy("score")
        .agg(sum("pos").as("pc"), sum(lit(1L) - col("pos")).as("nc"))
      // scores live in [-1, 1]; 2^-4-wide buckets give the two-level
      // scan ~32 bucket summaries and ≤ |distinct scores|/32-ish rows
      // per in-bucket reducer
      val c = PrefixSum.cumSum(h, "score", Seq("nc"), bucketWidth = 0.0625)
      c.agg(
          sum("pc").as("pos_n"), sum("nc").as("neg_n"),
          sum(col("pc") * (lit(2L) * col("pre_nc") + col("nc"))).as("u2"))
        .select(col("pos_n"), col("neg_n"), col("u2"),
          (col("u2").cast("double") /
            (lit(2L) * col("pos_n") * col("neg_n")).cast("double")).as("auc"))
    }),

    // ---- a28: two-sample KS statistic between md5-split halves ----
    "a28_ks_drift" -> ((s, d) => {
      val h = t(s, d, "documents")
        .select(col("n_chars"), inA.as("a"))
        .groupBy("n_chars")
        .agg(sum("a").as("ca"), sum(lit(1L) - col("a")).as("cb"))
      val c = PrefixSum.cumSum(h, "n_chars", Seq("ca", "cb"), bucketWidth = 64.0)
      val tot = h.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
      c.crossJoin(broadcast(tot))
        .select(col("n_a"), col("n_b"),
          abs(col("cum_ca") * col("n_b") - col("cum_cb") * col("n_a")).as("dn"))
        .groupBy("n_a", "n_b").agg(max("dn").as("d_num"))
        .select(col("n_a"), col("n_b"), col("d_num"),
          (col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("ks_d"))
    }),

    // ---- a29: per-language chi-square drift contributions ----
    "a29_chi2_drift" -> ((s, d) => {
      val o = t(s, d, "documents")
        .select(col("lang"), inA.as("a"))
        .groupBy("lang")
        .agg(sum("a").as("obs_a"), sum(lit(1L) - col("a")).as("obs_b"))
      val tot = o.agg(sum("obs_a").as("ta"), sum("obs_b").as("tb"))
      def contrib(obs: Column, colTot: Column, n: Column): Column = {
        val row = col("obs_a") + col("obs_b")
        val num = obs * n - row * colTot
        (num * num).cast("double") / (n * row * colTot).cast("double")
      }
      o.crossJoin(broadcast(tot))
        .select(col("lang"), col("obs_a"), col("obs_b"),
          contrib(col("obs_a"), col("ta"), col("ta") + col("tb")).as("chi2_a"),
          contrib(col("obs_b"), col("tb"), col("ta") + col("tb")).as("chi2_b"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a27_auc" ->
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
         h AS (SELECT score, sum(pos) AS pc, sum(1 - pos) AS nc
           FROM sc GROUP BY score),
         c AS (SELECT score, pc, nc,
             coalesce(sum(nc) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
           FROM h)
         SELECT CAST(sum(pc) AS BIGINT) AS pos_n,
           CAST(sum(nc) AS BIGINT) AS neg_n,
           CAST(sum(pc * (2 * nb + nc)) AS BIGINT) AS u2,
           CAST(sum(pc * (2 * nb + nc)) AS DOUBLE)
             / CAST(2 * sum(pc) * sum(nc) AS DOUBLE) AS auc
         FROM c""",
    "a28_ks_drift" ->
      """WITH h AS (
           SELECT n_chars,
             sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               THEN 0 ELSE 1 END) AS cb
           FROM documents GROUP BY n_chars),
         c AS (
           SELECT sum(ca) OVER (ORDER BY n_chars) AS cum_ca,
             sum(cb) OVER (ORDER BY n_chars) AS cum_cb
           FROM h),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b FROM h)
         SELECT n_a, n_b,
           CAST(max(abs(cum_ca * n_b - cum_cb * n_a)) AS BIGINT) AS d_num,
           CAST(max(abs(cum_ca * n_b - cum_cb * n_a)) AS DOUBLE)
             / CAST(n_a * n_b AS DOUBLE) AS ks_d
         FROM c, tot GROUP BY n_a, n_b""",
    "a29_chi2_drift" ->
      """WITH o AS (
           SELECT lang,
             CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               THEN 1 ELSE 0 END) AS BIGINT) AS obs_a,
             CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
               THEN 0 ELSE 1 END) AS BIGINT) AS obs_b
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(sum(obs_a) AS BIGINT) AS ta,
             CAST(sum(obs_b) AS BIGINT) AS tb FROM o)
         SELECT lang, obs_a, obs_b,
           CAST((obs_a * (ta + tb) - (obs_a + obs_b) * ta)
              * (obs_a * (ta + tb) - (obs_a + obs_b) * ta) AS DOUBLE)
             / CAST((ta + tb) * (obs_a + obs_b) * ta AS DOUBLE) AS chi2_a,
           CAST((obs_b * (ta + tb) - (obs_a + obs_b) * tb)
              * (obs_b * (ta + tb) - (obs_a + obs_b) * tb) AS DOUBLE)
             / CAST((ta + tb) * (obs_a + obs_b) * tb AS DOUBLE) AS chi2_b
         FROM o, tot ORDER BY lang"""
  )
}
