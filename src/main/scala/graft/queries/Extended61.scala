package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 61: exact-N deterministic sampling — the missing sibling
  * of t9's fraction-based stratified split (Extended2.scala:93). A
  * training-data pipeline needs BOTH: fractions for throughput-shaped
  * subsets, exact counts for eval sets and per-domain quotas ("exactly 5
  * held-out docs per language, reproducibly, on any cluster layout").
  *
  *  - tp22_uniform_sample_n: global exact-N uniform sample. The sampling
  *    key is md5(doc_id) — a deterministic uniform draw shared verbatim
  *    with the oracle — and "take the N smallest keys" is TakeOrdered:
  *    each map partition keeps a bounded N-row heap and only those
  *    survivors travel, so the op moves O(partitions·N) rows at ANY
  *    corpus size. No sort, no shuffle of the data, no RNG state.
  *  - tp23_per_domain_sample: exactly k docs per language through the
  *    bounded-heap [[graft.plans.GroupTopK]] physical operator (the same
  *    two-phase contract as partial aggregation: map-side k-heaps per
  *    group, one clustered exchange of ≤ partitions·groups·k rows). The
  *    window restatement (row_number ≤ k) is left to the ORACLE side
  *    precisely because at 100 TB the window form is a full sort-shuffle
  *    of every row — the plan difference is the point of the operator.
  *
  * Reference context: the reference has no sampling surface (sampling is
  * done by its callers); these extend the training-pipeline layer like
  * tp1-tp21.
  */
object Extended61 {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic uniform draw in [0,1)-by-proxy: the md5 hex of the id.
    * Shared bit-for-bit with DuckDB (`md5(CAST(doc_id AS VARCHAR))`).
    */
  private def skey = md5(col("doc_id").cast("string").cast("binary"))

  val queries: Map[String, Q] = Map(
    // ---- global exact-N uniform sample (TakeOrdered, no sort) ----
    "tp22_uniform_sample_n" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), skey.as("skey"))
        .orderBy("skey")
        .limit(100)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- exactly k docs per language (bounded-heap GroupTopK) ----
    "tp23_per_domain_sample" -> ((s, d) => {
      val keyed = t(s, d, "documents")
        .select(col("lang"), col("doc_id"), skey.as("skey"))
      graft.plans.GroupTopK.topK(keyed, Seq("lang"),
          Seq(("skey", true), ("doc_id", true)), 5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp22_uniform_sample_n" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang FROM documents
           ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100)
         ORDER BY doc_id""",
    "tp23_per_domain_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 5 ORDER BY lang, doc_id"""
  )
}
