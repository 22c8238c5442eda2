package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.{Multimodal, Text}

/** Round-7 batch 87: the multi-class evaluation view of the language-ID
  * heuristic, and the resize path gated end-to-end through real codecs.
  *
  *  - t28_lang_confusion: the confusion matrix of t3's marker-word
  *    language identifier against the corpus labels — per (true lang,
  *    predicted lang): count and the within-class share (recall on the
  *    diagonal, the error budget off it). Counts from ONE hash
  *    aggregate; shares one division each. tp29/tp30 evaluate the binary
  *    classifier; this is the multi-class twin the curation board reads
  *    before trusting per-language routing.
  *  - mm8_resize_stats: synthesize → [[Multimodal.resize]] to 4×4
  *    (JDK decode → deterministic floor-sampled nearest neighbour → JDK
  *    PNG re-encode) → [[Multimodal.extractTileSums]] (JDK decode
  *    again). TWO real codec round-trips stand between the generation
  *    stream and the output, and the oracle restates the quadrant sums
  *    from that stream with no codec at all — sx = ⌊x·w/4⌋, sy = ⌊y·h/4⌋
  *    are pure integer ops, so a lossy or mis-sampled resize cannot
  *    hash-match.
  *
  * Scale shape: t28 is one scan → one ≤|langs|² aggregate; mm8 is two
  * mapPartitions codec passes, no shuffle.
  *
  * Reference context: no counterpart; completes the evaluation family
  * (binary → multi-class) and gates the last un-queried multimodal
  * kernel (resize) with an oracle.
  */
object Extended87 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "t28_lang_confusion" -> ((s, d) => {
      val scored = t(s, d, "documents")
        .select(col("lang"), Text.langId(col("text")).as("lang_pred"))
      val cells = scored.groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang").agg(sum("n").as("n_lang"))
      cells.join(tot, "lang")
        .select(col("lang"), col("lang_pred"), col("n"),
          round(col("n").cast("double") / col("n_lang").cast("double"), 6)
            .as("share"))
        .orderBy("lang", "lang_pred")
    }),

    "mm8_resize_stats" -> ((s, d) => {
      val media = Multimodal.synthesizeImages(t(s, d, "documents"), "doc_id")
      Multimodal.extractTileSums(Multimodal.resize(media, 4, 4))
        .select("media_id", "width", "height", "t0", "t1", "t2", "t3",
          "brightest")
        .orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t28_lang_confusion" -> {
      def marks(lang: String) =
        Text.Markers(lang).toSeq.sorted.map("'" + _ + "'").mkString(",")
      s"""WITH w AS (
           SELECT doc_id, lang, text,
             length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
             list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'), x -> x <> '') AS ws
           FROM documents),
         s AS (
           SELECT doc_id, lang, text, cjk, ws,
             len(list_filter(ws, x -> x IN (${marks("en")}))) AS s_en,
             len(list_filter(ws, x -> x IN (${marks("de")}))) AS s_de,
             len(list_filter(ws, x -> x IN (${marks("es")}))) AS s_es,
             len(list_filter(ws, x -> x IN (${marks("fr")}))) AS s_fr
           FROM w),
         p AS (
           SELECT lang,
             CASE WHEN text IS NULL OR text = '' THEN 'und'
                  WHEN cjk * 2 >= length(text) THEN 'zh'
                  WHEN len(ws) = 0 THEN 'und'
                  WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
           FROM s),
         c AS (
           SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
           FROM p GROUP BY lang, lang_pred),
         tt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
                FROM c GROUP BY lang)
         SELECT lang, lang_pred, n,
           round(CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE), 6) AS share
         FROM c JOIN tt USING (lang)
         ORDER BY lang, lang_pred"""
    },
    "mm8_resize_stats" -> {
      val seeds =
        "list_transform(range(0, w*h*3), i -> (doc_id*1000003 + i)::HUGEINT)"
      // resized pixel p (4x4 target, 0-based): sx = (p%4)*w//4,
      // sy = (p//4)*h//4 — the engine's floor-sampling rule; channel c of
      // the SOURCE flat index sy*w+sx
      def tileSum(cond: String) =
        s"""CAST(list_aggregate([
             vals[3*(((p // 4) * h // 4) * w + ((p % 4) * w // 4)) + 1]
           + vals[3*(((p // 4) * h // 4) * w + ((p % 4) * w // 4)) + 2]
           + vals[3*(((p // 4) * h // 4) * w + ((p % 4) * w // 4)) + 3]
             FOR p IN range(0, 16) IF $cond], 'sum') AS BIGINT)"""
      s"""WITH d AS (
           SELECT doc_id, 3 + doc_id % 6 AS w, 3 + (doc_id // 6) % 6 AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h,
             list_transform(${OracleSql.splitmixList(seeds)},
               z -> z % 256) AS vals
           FROM d),
         ts AS (
           SELECT doc_id,
             ${tileSum("p // 4 < 2 AND p % 4 < 2")} AS t0,
             ${tileSum("p // 4 < 2 AND p % 4 >= 2")} AS t1,
             ${tileSum("p // 4 >= 2 AND p % 4 < 2")} AS t2,
             ${tileSum("p // 4 >= 2 AND p % 4 >= 2")} AS t3
           FROM px)
         SELECT doc_id AS media_id, CAST(4 AS INT) AS width,
           CAST(4 AS INT) AS height, t0, t1, t2, t3,
           CAST(CASE WHEN t0 >= t1 AND t0 >= t2 AND t0 >= t3 THEN 0
             WHEN t1 >= t2 AND t1 >= t3 THEN 1
             WHEN t2 >= t3 THEN 2 ELSE 3 END AS INT) AS brightest
         FROM ts ORDER BY media_id"""
    }
  )
}
