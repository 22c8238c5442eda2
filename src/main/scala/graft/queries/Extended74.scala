package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 74: span-corruption masking (the T5/UL2 denoising-
  * objective data step) as a deterministic, engine-portable transform.
  *
  * tp28_span_corruption: every token position p of a document starts a
  * corruption span iff `splitmix64(doc_id·31 + p) % 16 == 0` (≈ 6.25%
  * of positions), and a span covers positions p..p+2 — so the masked
  * set is the union of 3-token windows and the expected mask rate is
  * ≈ 17%, the T5 ballpark. The decision is STATELESS per position
  * (position p is masked iff any of p−2..p starts a span), which is
  * what makes it both embarrassingly parallel at 100 TB — a map-side
  * `transform` over the token index range, no sequential scan state —
  * and restatable in SQL from the same public splitmix64 stream the
  * multimodal and hashing kernels share. Per doc: token count, masked
  * count, span-start count, mask fraction (one division).
  *
  * Reference context: no counterpart; extends the tp-family
  * pretraining-data steps (tp1 packing, tp13 dup spans).
  */
object Extended74 {
  type Q = (SparkSession, String) => DataFrame

  /** splitmix64 as a Column (the native expression — JVM wrap-around
    * arithmetic, so ANSI mode cannot overflow-throw on the constants).
    */
  private def sm(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // the expression assumes a LONG child (the house `coerced` pattern):
    // cast here so int-typed seeds can't ClassCastException at eval
    ColumnBridge.column(
      graft.functions.SplitMix64(ColumnBridge.expression(c.cast("long"))))
  }

  val queries: Map[String, Q] = Map(
    "tp28_span_corruption" -> ((s, d) => {
      // span starts at position p iff the low 4 bits of the stream value
      // vanish (z % 16 = 0 ⟺ (z & 15) = 0 — sign-independent, so the
      // signed JVM long and the oracle's unsigned HUGEINT agree)
      def starts(p: org.apache.spark.sql.Column) =
        sm(col("doc_id") * lit(31L) + p.cast("long")) % 16L === 0L
      val idx = sequence(lit(0), size(col("words")) - 1)
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), size(col("words")).cast("long").as("n_tokens"),
          aggregate(
            transform(idx, p => when(starts(p), 1L).otherwise(0L)),
            lit(0L), (a, x) => a + x).as("n_spans"),
          aggregate(
            transform(idx, p => when(
              starts(p)
                || (p >= 1 && starts(p - 1))
                || (p >= 2 && starts(p - 2)), 1L).otherwise(0L)),
            lit(0L), (a, x) => a + x).as("n_masked"))
        .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("n_masked"),
          (col("n_masked").cast("double") / col("n_tokens").cast("double"))
            .as("mask_frac"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp28_span_corruption" -> {
      // splitmix64 of (doc_id*31 + p), unsigned, mod 16
      val starts = "list_transform(range(0, n), p -> (doc_id*31 + p)::HUGEINT)"
      s"""WITH w AS (
           SELECT doc_id,
             len(string_split(text, ' ')) AS n
           FROM documents),
         h AS (
           SELECT doc_id, n,
             list_transform(${OracleSql.splitmixList(starts)},
               z -> CASE WHEN z % 16 = 0 THEN 1 ELSE 0 END) AS st
           FROM w),
         m AS (
           SELECT doc_id, n,
             CAST(list_aggregate(st, 'sum') AS BIGINT) AS n_spans,
             CAST(list_aggregate(list_transform(range(1, n + 1), p ->
               CASE WHEN st[p] = 1
                 OR (p >= 2 AND st[p-1] = 1)
                 OR (p >= 3 AND st[p-2] = 1) THEN 1 ELSE 0 END),
               'sum') AS BIGINT) AS n_masked
           FROM h)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_spans, n_masked,
           CAST(n_masked AS DOUBLE) / CAST(n AS DOUBLE) AS mask_frac
         FROM m ORDER BY doc_id"""
    }
  )
}
