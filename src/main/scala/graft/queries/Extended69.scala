package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 69: CDC materialization and cross-source corpus
  * similarity.
  *
  *  - u8_cdc_apply: materialize the FINAL state of a keyed table from an
  *    ordered change feed of INSERT/UPDATE/DELETE operations — the
  *    last-writer-wins-with-deletes contract every CDC sink implements
  *    (u5's MERGE applies ONE delta; this folds a whole ordered log).
  *    The op log is derived deterministically from the events table
  *    (op by md5 of the event id, seq by event time); the plan is one
  *    keyed row_number window (parallel across keys) + a delete filter.
  *    At 100 TB this is the compaction shape: only the per-key TAIL
  *    matters, so log segments fold incrementally.
  *  - t26_source_overlap: the source×source vocabulary-overlap matrix
  *    (exact Jaccard over word sets) — "which crawls duplicate each
  *    other's language" at corpus level. The word→source relation is
  *    distinct-compressed FIRST, so the self-join fans out at most
  *    |sources| rows per word (bounded by the catalog, not the corpus)
  *    and the matrix is |sources|² aggregates. Never a doc×doc or
  *    word×word product.
  *
  * Reference context: no counterpart; extends the u-family (set/merge
  * ops) and t-family (corpus statistics).
  */
object Extended69 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- u8: ordered CDC feed → final table state ----
    "u8_cdc_apply" -> ((s, d) => {
      // deterministic op mix: ~1/8 deletes, ~7/8 upserts, keyed by user
      val ops = t(s, d, "events").select(
        col("user_id").as("key"),
        unix_micros(col("ts")).as("seq"),
        col("event_id"),
        when(substring(md5(col("event_id").cast("string").cast("binary")),
          1, 1).isin("0", "1"), "D").otherwise("U").as("op"),
        round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy("key")
        .orderBy(col("seq").desc, col("event_id").desc)
      ops.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("key"), col("seq").as("last_seq"),
          col("event_id").as("last_event"), col("cents").as("cents"))
        .orderBy("key")
    }),

    // ---- t26: source×source exact vocabulary Jaccard ----
    "t26_source_overlap" -> ((s, d) => {
      val ws = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .distinct()
      val vocab = ws.groupBy("source").agg(count(lit(1)).as("v"))
      val inter = ws.as("x").join(ws.as("y"),
          col("x.word") === col("y.word") &&
            col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("common"))
      inter
        .join(broadcast(vocab.select(col("source").as("src_a"),
          col("v").as("va"))), Seq("src_a"))
        .join(broadcast(vocab.select(col("source").as("src_b"),
          col("v").as("vb"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("common"),
          (col("common").cast("double") /
            (col("va") + col("vb") - col("common")).cast("double"))
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "u8_cdc_apply" ->
      """WITH ops AS (
           SELECT user_id AS key,
             CAST(epoch_us(ts) AS BIGINT) AS seq,
             event_id,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
               IN ('0', '1') THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY key ORDER BY seq DESC, event_id DESC) AS rn
           FROM ops)
         SELECT key, seq AS last_seq, event_id AS last_event, cents
         FROM ranked WHERE rn = 1 AND op <> 'D'
         ORDER BY key""",
    "t26_source_overlap" ->
      """WITH ws AS (
           SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
         vocab AS (SELECT source, CAST(count(*) AS BIGINT) AS v
                   FROM ws GROUP BY source),
         inter AS (
           SELECT x.source AS src_a, y.source AS src_b,
             CAST(count(*) AS BIGINT) AS common
           FROM ws x JOIN ws y
             ON x.word = y.word AND x.source < y.source
           GROUP BY 1, 2)
         SELECT src_a, src_b, common,
           CAST(common AS DOUBLE) / CAST(va.v + vb.v - common AS DOUBLE)
             AS jaccard
         FROM inter
         JOIN vocab va ON va.source = src_a
         JOIN vocab vb ON vb.source = src_b
         ORDER BY src_a, src_b"""
  )
}
