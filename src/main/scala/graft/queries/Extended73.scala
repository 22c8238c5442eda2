package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 73: binary-sign embedding retrieval — the last member
  * of the quantized-ANN family (float brute / LSH / IVF / PQ / SQ8 /
  * now 1-bit).
  *
  * v9_binary_hamming_topk: each 64-dim embedding compresses to TWO
  * 32-bit sign words (bit i set iff dim i > 0 — two words rather than
  * one 64-bit code because bit 63 of a BIGINT is the sign bit and
  * DuckDB refuses `1 << 63`; ceil(d/32) words generalizes to any
  * dimension). Retrieval ranks by Hamming distance
  * `bit_count(lo⊕qlo) + bit_count(hi⊕qhi)` — 64× less scan than the
  * float vectors, the "binary passage retrieval" first pass — with the
  * deterministic (distance, id) tie-break. Codes are integers, so the
  * whole parity surface is exact; at scale the code words are STORED
  * columns (the AnnStore discipline) and the scan reads 8 bytes per
  * vector.
  *
  * Reference context: no counterpart; completes the v-family beside
  * ann_* (Similarity.scala).
  */
object Extended73 {
  type Q = (SparkSession, String) => DataFrame

  /** 32 sign bits of dims [off, off+32) packed into a long (Spark SQL
    * arrays are 0-based in expr).
    */
  private def word(off: Int): String =
    s"aggregate(transform(sequence(0, 31), i -> " +
      s"IF(v[i + $off] > 0.0d, shiftleft(1L, i), 0L)), 0L, (a, x) -> a | x)"

  val queries: Map[String, Q] = Map(
    "v9_binary_hamming_topk" -> ((s, d) => {
      val coded = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), expr(word(0)).as("lo"), expr(word(32)).as("hi"))
      val q = coded.filter(col("vec_id") === 0)
        .select(col("lo").as("qlo"), col("hi").as("qhi"))
      coded.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)").as("hamming"))
        .orderBy(col("hamming"), col("vec_id"))
        .limit(10)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "v9_binary_hamming_topk" -> {
      def word(off: Int) =
        s"list_aggregate(list_transform(range(0, 32), i -> " +
          s"CASE WHEN v[i + ${off + 1}] > 0.0 THEN (1::BIGINT << i) " +
          s"ELSE 0::BIGINT END), 'bit_or')"
      s"""WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         coded AS (
           SELECT vec_id, ${word(0)} AS lo, ${word(32)} AS hi FROM e),
         q AS (SELECT lo AS qlo, hi AS qhi FROM coded WHERE vec_id = 0)
         SELECT vec_id,
           CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) AS INT)
             AS hamming
         FROM coded, q WHERE vec_id <> 0
         ORDER BY hamming, vec_id LIMIT 10"""
    }
  )
}
