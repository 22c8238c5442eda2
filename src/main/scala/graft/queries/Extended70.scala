package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Multimodal

/** Round-7 batch 70: perceptual-hash image dedup over REALLY decoded
  * pixels — the multimodal counterpart of the text dedup family.
  *
  *  - mm5_image_ahash_dedup: every document gets a real PNG whose pixel
  *    stream is keyed by seed = doc_id/2, so consecutive doc pairs carry
  *    BYTE-IDENTICAL images under different ids (plus whatever natural
  *    collisions the 9–64-bit hash space of 3–8 px images produces —
  *    both kinds group identically in both engines). The pipeline is
  *    synthesize (JDK PNG encode) → [[graft.llm.Multimodal.imageAHash]]
  *    (JDK decode → integer-thresholded average-hash bit string) → one
  *    hash-keyed aggregate for the duplicate groups. A stubbed or wrong
  *    decoder cannot reproduce the oracle's hashes, which are restated
  *    from the public splitmix64 generation stream with no codec at all.
  *
  * Scale: hashing is mapPartitions over the media relation (decoder
  * amortized per partition, no shuffle); the dedup is one groupBy on the
  * (w, h, hash) key — the standard perceptual-dedup shape for an image
  * corpus (cf. the text family's dedup_exact on md5).
  */
object Extended70 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm5_image_ahash_dedup" -> ((s, d) => {
      val media = Multimodal.synthesizeImagesSeeded(
        t(s, d, "documents"), "doc_id", floor(col("doc_id") / 2L))
      Multimodal.imageAHash(media)
        .groupBy("width", "height", "ahash")
        .agg(count(lit(1)).as("n_docs"),
          min("media_id").as("min_doc"), max("media_id").as("max_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("width", "height", "ahash")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "mm5_image_ahash_dedup" -> {
      val seeds =
        "list_transform(range(0, w*h*3), i -> (seed*1000003 + i)::HUGEINT)"
      s"""WITH d AS (
           SELECT doc_id, doc_id // 2 AS seed,
             3 + ((doc_id // 2) % 6) AS w,
             3 + (((doc_id // 2) // 6) % 6) AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h,
             list_transform(${OracleSql.splitmixList(seeds)},
               z -> z % 256) AS vals
           FROM d),
         g AS (
           SELECT doc_id, w, h,
             list_transform(range(0, w*h),
               p -> vals[3*p+1] + vals[3*p+2] + vals[3*p+3]) AS gray,
             list_aggregate(vals, 'sum') AS total
           FROM px),
         hashed AS (
           SELECT doc_id, w, h,
             array_to_string(list_transform(range(1, w*h+1),
               p -> CASE WHEN gray[p] * (w*h) > total THEN '1' ELSE '0' END),
               '') AS ahash
           FROM g)
         SELECT w::INT AS width, h::INT AS height, ahash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
         FROM hashed GROUP BY w, h, ahash
         HAVING count(*) >= 2
         ORDER BY width, height, ahash"""
    }
  )
}
