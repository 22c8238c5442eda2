package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 11: benchmark decontamination — the
  * training-pipeline step that flags training documents sharing long
  * n-gram spans with an evaluation set, so eval answers don't leak into
  * the corpus.
  *
  * Shape at scale: both sides explode to DISTINCT word 5-gram shingles and
  * meet in an equi-join on the shingle string — shuffle is (shingles),
  * never (train × bench) pairs. The benchmark side is tiny by definition
  * (eval sets are thousands of docs, the corpus is billions), so at 100 TB
  * the join broadcasts the benchmark shingle set and the train side
  * streams map-side; overlap counting is a partial-aggregatable count.
  * 5-gram spans (vs the 8-13 typical for web-scale decontamination) fit
  * the short synthetic documents; the n is a parameter, not a design
  * point.
  */
object Extended11 {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // per-benchmark-doc contamination report: how many training docs share
    // at least one 5-gram, the worst overlap, and the total hit mass —
    // zeros preserved so the report covers the whole eval set
    "t16_contamination" -> ((s, d) => {
      val sh = t(s, d, "documents")
        .select(col("doc_id"), expr(Extended9.toks).as("ws"))
        .filter(size(col("ws")) >= 5)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(5, size(ws)), " +
            "i -> array_join(slice(ws, i - 4, 5), ' ')))")).as("s"))
      val bench = sh.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bench_id"), col("s"))
      val train = sh.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("train_id"), col("s"))
      val ov = train.join(broadcast(bench), "s")
        .groupBy("bench_id", "train_id").agg(count(lit(1)).as("overlap"))
        .groupBy("bench_id").agg(
          count(lit(1)).as("n_contaminated"),
          max("overlap").as("max_overlap"),
          sum("overlap").as("total_overlap"))
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id").as("bench_id"))
        .join(ov, Seq("bench_id"), "left")
        .select(col("bench_id"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          coalesce(col("max_overlap"), lit(0L)).as("max_overlap"),
          coalesce(col("total_overlap"), lit(0L)).as("total_overlap"))
        .orderBy("bench_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "t16_contamination" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(5, len(ws) + 1),
               i -> array_to_string(ws[i - 4 : i], ' '))) AS s
           FROM toks WHERE len(ws) >= 5),
         bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
         train AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id >= 20),
         ov AS (SELECT bench_id, train_id, count(*) AS overlap
                FROM train JOIN bench USING (s) GROUP BY 1, 2),
         rep AS (SELECT bench_id,
             CAST(count(*) AS BIGINT) AS n_contaminated,
             CAST(max(overlap) AS BIGINT) AS max_overlap,
             CAST(sum(overlap) AS BIGINT) AS total_overlap
           FROM ov GROUP BY 1)
         SELECT d.doc_id AS bench_id,
           coalesce(n_contaminated, 0) AS n_contaminated,
           coalesce(max_overlap, 0) AS max_overlap,
           coalesce(total_overlap, 0) AS total_overlap
         FROM documents d LEFT JOIN rep ON d.doc_id = rep.bench_id
         WHERE d.doc_id < 20
         ORDER BY bench_id"""
  )
}
