package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.{Multimodal, Text}

/** Round-7 batch 81: training-batch planning over text, and tile pooling
  * over really-decoded images.
  *
  *  - tp33_length_bucket_batches: the dynamic-batching plan a trainer
  *    derives before a run — documents bucketed by their padded length
  *    (token count rounded UP to the next power of two; the universal
  *    "pad to bucket" rule that bounds padding waste at <2×), then per
  *    (lang, padded): doc count, exact token total, docs-per-batch under
  *    a 4096-token budget, the batch count ⌈docs/per⌉, and the exact
  *    padding waste n_docs·padded − Σtokens. The power-of-two round-up
  *    is computed with INTEGER bit arithmetic (2^len(bin(nw−1))) — no
  *    log2 float hazard at exact powers — and every output is a BIGINT
  *    except nothing: the whole row is integer-exact.
  *  - mm7_image_tiles: 2×2 tile-grid intensity pooling over REALLY
  *    decoded PNGs (JDK codec, mm2/mm5's honesty contract): per image
  *    the exact per-quadrant RGB sums and the brightest quadrant
  *    (ties → lowest index). The oracle restates the sums from the
  *    public splitmix64 generation stream with no codec, so a stubbed
  *    or lossy decoder cannot hash-match.
  *
  * Scale shape: tp33 is one corpus scan → hash aggregate on (lang,
  * padded) — ≤ ~30 groups regardless of corpus size; mm7 is
  * mapPartitions decode (one codec per partition, no shuffle) exactly
  * like mm5/mm6.
  *
  * Reference context: no counterpart; extends the training-pipeline
  * family (tp1 sequence packing → tp33 batch planning) and the
  * multimodal family (mm5 pHash, mm6 DSP → mm7 tile pooling).
  */
object Extended81 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "tp33_length_bucket_batches" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("lang"), Text.tokenCount(col("text")).cast("long").as("nw"))
      val padded = when(col("nw") <= 1, 1L)
        .otherwise(expr("cast(power(2, length(bin(nw - 1))) as bigint)"))
      val perBucket = docs.select(col("lang"), col("nw"), padded.as("padded"))
        .groupBy("lang", "padded")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("sum_tokens"))
      val docsPerBatch = greatest(expr("4096 div padded"), lit(1L))
      perBucket.select(col("lang"), col("padded"), col("n_docs"),
          col("sum_tokens"), docsPerBatch.as("docs_per_batch"))
        .select(col("lang"), col("padded"), col("n_docs"), col("sum_tokens"),
          col("docs_per_batch"),
          // ceil(n/m) on positive BIGINTs, stated as (n + m − 1) div m
          expr("(n_docs + docs_per_batch - 1) div docs_per_batch")
            .as("n_batches"),
          (col("n_docs") * col("padded") - col("sum_tokens")).as("pad_waste"))
        .orderBy("lang", "padded")
    }),

    "mm7_image_tiles" -> ((s, d) => {
      val media = Multimodal.synthesizeImages(t(s, d, "documents"), "doc_id")
      Multimodal.extractTileSums(media)
        .select("media_id", "width", "height", "t0", "t1", "t2", "t3",
          "brightest")
        .orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp33_length_bucket_batches" ->
      """WITH d AS (
           SELECT lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS nw
           FROM documents),
         b AS (
           SELECT lang, nw,
             CASE WHEN nw <= 1 THEN 1
               ELSE CAST(power(2, length(bin(nw - 1))) AS BIGINT) END AS padded
           FROM d),
         g AS (
           SELECT lang, padded, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nw) AS BIGINT) AS sum_tokens
           FROM b GROUP BY lang, padded),
         p AS (
           SELECT lang, padded, n_docs, sum_tokens,
             greatest(4096 // padded, 1) AS docs_per_batch
           FROM g)
         SELECT lang, padded, n_docs, sum_tokens, docs_per_batch,
           (n_docs + docs_per_batch - 1) // docs_per_batch AS n_batches,
           n_docs * padded - sum_tokens AS pad_waste
         FROM p ORDER BY lang, padded""",
    "mm7_image_tiles" -> {
      val seeds =
        "list_transform(range(0, w*h*3), i -> (doc_id*1000003 + i)::HUGEINT)"
      s"""WITH d AS (
           SELECT doc_id, 3 + doc_id % 6 AS w, 3 + (doc_id // 6) % 6 AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h,
             list_transform(${OracleSql.splitmixList(seeds)},
               z -> z % 256) AS vals
           FROM d),
         ts AS (
           SELECT doc_id, w, h,
             CAST(list_aggregate([vals[3*p+1] + vals[3*p+2] + vals[3*p+3]
               FOR p IN range(0, w*h)
               IF 2*(p // w) < h AND 2*(p % w) < w], 'sum') AS BIGINT) AS t0,
             CAST(list_aggregate([vals[3*p+1] + vals[3*p+2] + vals[3*p+3]
               FOR p IN range(0, w*h)
               IF 2*(p // w) < h AND 2*(p % w) >= w], 'sum') AS BIGINT) AS t1,
             CAST(list_aggregate([vals[3*p+1] + vals[3*p+2] + vals[3*p+3]
               FOR p IN range(0, w*h)
               IF 2*(p // w) >= h AND 2*(p % w) < w], 'sum') AS BIGINT) AS t2,
             CAST(list_aggregate([vals[3*p+1] + vals[3*p+2] + vals[3*p+3]
               FOR p IN range(0, w*h)
               IF 2*(p // w) >= h AND 2*(p % w) >= w], 'sum') AS BIGINT) AS t3
           FROM px)
         SELECT doc_id AS media_id, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, t0, t1, t2, t3,
           CAST(CASE WHEN t0 >= t1 AND t0 >= t2 AND t0 >= t3 THEN 0
             WHEN t1 >= t2 AND t1 >= t3 THEN 1
             WHEN t2 >= t3 THEN 2 ELSE 3 END AS INT) AS brightest
         FROM ts ORDER BY media_id"""
    }
  )
}
