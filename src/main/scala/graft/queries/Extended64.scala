package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity
import graft.operators.PrefixSum

/** Round-7 batch 64: multi-vector late-interaction retrieval and global
  * curriculum ordering — two more training-pipeline shapes.
  *
  *  - v8_maxsim: ColBERT-style MaxSim late interaction. Each 64-dim
  *    embedding is treated as 8 token-level sub-vectors (8 dims each —
  *    the deterministic stand-in for per-token embeddings, like v4's
  *    Matryoshka prefix stands in for a stored prefix column);
  *    MaxSim(q, d) = Σ_i max_j ⟨q_i, d_j⟩. The max runs per (doc,
  *    query-sub) as a hash aggregate over the exploded sub-vector
  *    relation (corpus side explodes 8×, probe side is an 8-row
  *    broadcast — never a doc×doc product), the dot is the native
  *    codegen kernel, and the final 8-term sum is written as one
  *    left-associated expression so both engines run the identical
  *    IEEE sequence (no distributed float sum anywhere).
  *  - tp24_curriculum_order: assign every document its GLOBAL position
  *    in a curriculum (stages by length bucket, hash-shuffled within a
  *    stage) WITHOUT a global sort: per-stage counts → exclusive stage
  *    offsets via [[graft.operators.PrefixSum]] → per-stage
  *    row_number (parallel across stages) + offset. The oracle's
  *    single `row_number() OVER (ORDER BY …)` restatement is exactly
  *    the full-sort plan this operator replaces — at 100 TB the
  *    curriculum write is embarrassingly parallel per stage.
  *
  * Reference context: no counterpart in the reference; extends the
  * similarity (v-) and training-pipeline (tp-) layers.
  */
object Extended64 {
  type Q = (SparkSession, String) => DataFrame

  /** The 8 contiguous 8-dim sub-vectors of a 64-dim double array. */
  private def subVectors(v: Column): Column =
    transform(sequence(lit(0), lit(7)),
      i => slice(v, i * lit(8) + lit(1), lit(8)))

  val queries: Map[String, Q] = Map(
    // ---- v8: MaxSim late-interaction top-10 ----
    "v8_maxsim" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === 0)
        .select(posexplode(subVectors(col("v"))).as(Seq("qi", "qv")))
      val ds = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), explode(subVectors(col("v"))).as("dv"))
      val mx = ds.crossJoin(broadcast(q))
        .groupBy("vec_id", "qi")
        .agg(max(Similarity.dot(col("dv"), col("qv"))).as("mx"))
      val arr = mx.groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("qi"), col("mx")))).as("a"))
      def m(i: Int): Column = col("a")(i)("mx")
      arr.select(col("vec_id"),
          (m(0) + m(1) + m(2) + m(3) + m(4) + m(5) + m(6) + m(7)).as("maxsim"))
        .orderBy(col("maxsim").desc, col("vec_id"))
        .limit(10)
    }),

    // ---- tp24: global curriculum position without a global sort ----
    "tp24_curriculum_order" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          floor(col("n_chars") / 64L).cast("long").as("stage"),
          md5(col("doc_id").cast("string").cast("binary")).as("k"))
      val counts = docs.groupBy("stage").agg(count(lit(1)).as("n"))
      // exclusive stage offsets: rows before this stage in the curriculum
      val offsets = PrefixSum.cumSum(counts, "stage", Seq("n"),
          bucketWidth = 4.0)
        .select(col("stage"), col("pre_n").as("off"))
      val w = Window.partitionBy("stage").orderBy(col("k"), col("doc_id"))
      docs.join(broadcast(offsets), Seq("stage"))
        .select(col("doc_id"), col("stage"),
          (col("off") + row_number().over(w)).as("global_rank"))
        .orderBy("global_rank")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "v8_maxsim" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         idx AS (SELECT unnest(range(0, 8)) AS i),
         q AS (
           SELECT i AS qi, qv.v[8*i+1:8*i+8] AS qv
           FROM idx, (SELECT v FROM e WHERE vec_id = 0) qv(v)),
         ds AS (
           SELECT vec_id, v[8*i+1:8*i+8] AS dv
           FROM e, idx WHERE vec_id <> 0),
         mx AS (
           SELECT d.vec_id, q.qi,
             max(list_dot_product(d.dv, q.qv)) AS mx
           FROM ds d, q GROUP BY d.vec_id, q.qi),
         arr AS (
           SELECT vec_id, list(mx ORDER BY qi) AS a FROM mx GROUP BY vec_id)
         SELECT vec_id,
           a[1] + a[2] + a[3] + a[4] + a[5] + a[6] + a[7] + a[8] AS maxsim
         FROM arr ORDER BY maxsim DESC, vec_id LIMIT 10""",
    "tp24_curriculum_order" ->
      """SELECT doc_id, CAST(floor(n_chars / 64) AS BIGINT) AS stage,
           CAST(row_number() OVER (ORDER BY floor(n_chars / 64),
             md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS global_rank
         FROM documents ORDER BY global_rank"""
  )
}
