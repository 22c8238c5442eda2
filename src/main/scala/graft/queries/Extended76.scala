package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 76: the operating-point sweep that turns a27's AUC
  * into a deployable filter decision.
  *
  * tp29_threshold_sweep: confusion counts and precision / recall / F1
  * for the tp14 hashed-bigram classifier (via Extended62's shared
  * scorer) against the lang == 'en' reference label, at five literal
  * logit thresholds. Counts are one grouped aggregate over the
  * score×threshold cross (the threshold table is a 5-row broadcast);
  * every metric is ONE division from exact integers — F1 in its
  * single-division form 2·tp / (2·tp + fp + fn), so no
  * precision·recall product chains roundings.
  *
  * Reference context: no counterpart; extends the evaluation layer
  * (a27 AUC → tp29 operating points).
  */
object Extended76 {
  type Q = (SparkSession, String) => DataFrame

  private val Thresholds = Seq(-0.02, -0.01, 0.0, 0.01, 0.02)

  val queries: Map[String, Q] = Map(
    "tp29_threshold_sweep" -> ((s, d) => {
      val sc = Extended62.classifierScores(s, d)
      val th = s.range(1)
        .select(explode(array(Thresholds.map(lit): _*)).as("threshold"))
      sc.crossJoin(broadcast(th))
        .groupBy("threshold")
        .agg(
          sum(when(col("score") >= col("threshold") && col("pos") === 1L, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("threshold") && col("pos") === 0L, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") < col("threshold") && col("pos") === 1L, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("score") < col("threshold") && col("pos") === 0L, 1L)
            .otherwise(0L)).as("tn"))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
            .as("precision"),
          (col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
            .as("recall"),
          ((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
            .as("f1"))
        .orderBy("threshold")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp29_threshold_sweep" -> {
      // unnest + explicit DOUBLE cast: a bare VALUES list would type the
      // thresholds DECIMAL in DuckDB and the hash compare renders types
      val values = Thresholds.mkString(", ")
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words
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
         th AS (SELECT CAST(unnest([$values]) AS DOUBLE) AS threshold),
         c AS (
           SELECT threshold,
             CAST(sum(CASE WHEN score >= threshold AND pos = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN score >= threshold AND pos = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN score < threshold AND pos = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS fn,
             CAST(sum(CASE WHEN score < threshold AND pos = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS tn
           FROM sc CROSS JOIN th GROUP BY threshold)
         SELECT threshold, tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
           CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
         FROM c ORDER BY threshold"""
    }
  )
}
