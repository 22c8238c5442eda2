package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-8 batch 110: retrieval evaluation — the two measurements a
  * RAG / retrieval training pipeline runs before it trusts an index.
  * The v-family so far builds and audits retrievers (ann_*, v9, v11);
  * these two SCORE them.
  *
  *  - v15_rrf_fusion: Reciprocal Rank Fusion (Cormack et al., SIGIR'09
  *    — public formula score = Σ_r 1/(60 + rank_r)) of two retrievers
  *    the registry already trusts: exact float cosine (ann_brute) and
  *    the 1-bit sign-Hamming sketch (v9). Each retriever contributes a
  *    top-20 candidate list ranked by its own metric with the
  *    deterministic (score, vec_id) tie-break; ranks are INTEGERS, so
  *    the parity surface is two IEEE divisions and one two-term sum
  *    per fused row, written in the same order in both engines.
  *  - v16_ndcg_mrr: NDCG@10 and MRR of the cosine retriever against
  *    label relevance (a hit = candidate shares the query's `label`),
  *    over 5 broadcast query vectors. Rank discounts 1/log2(r+1) enter
  *    as SHARED LITERAL doubles (the a32 Benford discipline — no
  *    transcendental in the parity surface); DCG folds rel_r·w_r in
  *    rank order on both engines; the ideal DCG folds w_r over
  *    r ≤ min(|relevant|, 10) — |relevant| is an exact per-label count.
  *    MRR is one integer reciprocal.
  *
  * Scale shape: both are scan → per-candidate score (native codegen
  * cosine / two bit_count words) → bounded top-k (TakeOrdered global,
  * GroupTopK per query — the exchange carries k rows per map partition,
  * never the scored corpus). The rank window runs on the ≤20-row /
  * ≤50-row bounded artifact AFTER selection, not on the corpus. The
  * fused join is 20×20 rows; weight/count joins are broadcast.
  *
  * Reference context: no counterpart in the reference (entwiner has no
  * embedding surface); extends SURVEY §2's LLM-pipeline mandate on the
  * `embeddings` table.
  */
object Extended110 {
  type Q = (SparkSession, String) => DataFrame

  /** v9's sign packing: 32 sign bits of dims [off, off+32) in a long. */
  private def word(off: Int): String =
    s"aggregate(transform(sequence(0, 31), i -> " +
      s"IF(v[i + $off] > 0.0d, shiftleft(1L, i), 0L)), 0L, (a, x) -> a | x)"

  /** Rank discounts 1/log2(r+1), r = 1..10 — computed ONCE here and
    * rendered into both engines as the same shortest-roundtrip double
    * literals, so neither engine evaluates a log.
    */
  private val rankWeights: Seq[(Int, Double)] =
    (1 to 10).map(r => r -> 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  val queries: Map[String, Q] = Map(
    // ---- v15: reciprocal rank fusion of cosine and 1-bit Hamming ----
    "v15_rrf_fusion" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      // retriever A: exact float cosine, top-20 (TakeOrdered — bounded)
      val cosTop = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), Similarity.cosine(col("v"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(20)
      // rank within the 20-row artifact (k-bounded window, not corpus)
      val ranksA = cosTop.withColumn("ra",
          row_number().over(Window.orderBy(col("c").desc, col("vec_id"))))
        .select(col("vec_id"), col("ra"))
      // retriever B: 1-bit sign-Hamming (v9's two 32-bit words), top-20
      val coded = e.select(col("vec_id"),
        expr(word(0)).as("lo"), expr(word(32)).as("hi"))
      val qc = coded.filter(col("vec_id") === 0)
        .select(col("lo").as("qlo"), col("hi").as("qhi"))
      val hamTop = coded.filter(col("vec_id") =!= 0).crossJoin(broadcast(qc))
        .select(col("vec_id"),
          expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)").as("h"))
        .orderBy(col("h"), col("vec_id")).limit(20)
      val ranksB = hamTop.withColumn("rb",
          row_number().over(Window.orderBy(col("h"), col("vec_id"))))
        .select(col("vec_id"), col("rb"))
      // RRF: absent-from-a-list contributes 0 (the published rule).
      // The two-term sum is written cosine-term-first in both engines.
      val rrf = coalesce(lit(1.0) / (lit(60) + col("ra")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0))
      ranksA.join(ranksB, Seq("vec_id"), "full_outer")
        .withColumn("rrf_raw", rrf)
        .orderBy(col("rrf_raw").desc, col("vec_id")).limit(10)
        .select(col("vec_id"),
          coalesce(col("ra"), lit(0)).as("rank_cos"),
          coalesce(col("rb"), lit(0)).as("rank_ham"),
          round(col("rrf_raw"), 6).as("rrf"))
    }),

    // ---- v16: NDCG@10 + MRR of the cosine retriever vs labels ----
    "v16_ndcg_mrr" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
          col("label"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("label").as("qlabel"))
      val cand = e.filter(col("vec_id") >= 5)
      val pairs = cand.crossJoin(broadcast(q))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          Similarity.cosine(col("v"), col("qv")).as("c"))
      // bounded-heap per-query top-10; rank window on the ≤50-row artifact
      val top = graft.plans.GroupTopK.topK(pairs, Seq("qid"),
          Seq(("c", false), ("vec_id", true)), 10)
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))))
        .withColumn("rel",
          when(col("label") === col("qlabel"), 1).otherwise(0))
      val wDf = s.createDataFrame(rankWeights).toDF("r", "w")
      val perQ = top.join(broadcast(wDf), "r")
        .groupBy("qid").agg(
          aggregate(
            sort_array(collect_list(struct(col("r"),
              (col("rel") * col("w")).as("g")))),
            lit(0.0), (acc, x) => acc + x("g")).as("dcg"),
          min(when(col("rel") === 1, col("r"))).as("first_rel"))
      // |relevant| per query = exact per-label candidate count (no join
      // back through the scored pairs)
      val labCnt = cand.groupBy(col("label").as("qlabel"))
        .agg(count(lit(1)).as("n_rel"))
      val idcg = q.select(col("qid"), col("qlabel"))
        .join(broadcast(labCnt), Seq("qlabel"), "left")
        .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
        .join(broadcast(wDf), col("r") <= least(col("n_rel"), lit(10L)))
        .groupBy("qid", "n_rel").agg(
          aggregate(sort_array(collect_list(struct(col("r"), col("w")))),
            lit(0.0), (acc, x) => acc + x("w")).as("idcg"))
      perQ.join(idcg, "qid")
        .select(col("qid"), col("n_rel"),
          round(col("dcg"), 6).as("dcg"),
          round(col("idcg"), 6).as("idcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"),
          round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"))
        .orderBy("qid")
    })
  )

  val oracleSql: Map[String, String] = {
    import OracleSql.cosExact
    def wordSql(off: Int) =
      s"list_aggregate(list_transform(range(0, 32), i -> " +
        s"CASE WHEN v[i + ${off + 1}] > 0.0 THEN (1::BIGINT << i) " +
        s"ELSE 0::BIGINT END), 'bit_or')"
    val wValues = rankWeights
      .map { case (r, w) => s"($r, CAST($w AS DOUBLE))" }.mkString(", ")
    Map(
      "v15_rrf_fusion" ->
        s"""WITH e AS (
             SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           cosr AS (
             SELECT vec_id, CAST(row_number() OVER (
               ORDER BY ${cosExact("v", "qv")} DESC, vec_id) AS INT) AS ra
             FROM e, q WHERE vec_id <> 0),
           cos20 AS (SELECT * FROM cosr WHERE ra <= 20),
           coded AS (
             SELECT vec_id, ${wordSql(0)} AS lo, ${wordSql(32)} AS hi FROM e),
           qc AS (SELECT lo AS qlo, hi AS qhi FROM coded WHERE vec_id = 0),
           hamr AS (
             SELECT vec_id, CAST(row_number() OVER (
               ORDER BY bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)),
                 vec_id) AS INT) AS rb
             FROM coded, qc WHERE vec_id <> 0),
           ham20 AS (SELECT * FROM hamr WHERE rb <= 20),
           fused AS (
             SELECT COALESCE(c.vec_id, h.vec_id) AS vec_id,
               COALESCE(c.ra, 0) AS rank_cos, COALESCE(h.rb, 0) AS rank_ham,
               COALESCE(CAST(1 AS DOUBLE) / (60 + c.ra), CAST(0 AS DOUBLE))
                 + COALESCE(CAST(1 AS DOUBLE) / (60 + h.rb), CAST(0 AS DOUBLE))
                 AS rrf_raw
             FROM cos20 c FULL OUTER JOIN ham20 h ON c.vec_id = h.vec_id)
           SELECT vec_id, rank_cos, rank_ham, round(rrf_raw, 6) AS rrf
           FROM fused ORDER BY rrf_raw DESC, vec_id LIMIT 10""",
      "v16_ndcg_mrr" ->
        s"""WITH e AS (
             SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
             FROM embeddings),
           q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel
                 FROM e WHERE vec_id < 5),
           cand AS (SELECT * FROM e WHERE vec_id >= 5),
           ranked AS (
             SELECT q.qid, q.qlabel, c.vec_id, c.label,
               CAST(row_number() OVER (PARTITION BY q.qid
                 ORDER BY ${cosExact("c.v", "q.qv")} DESC, c.vec_id) AS INT)
                 AS r
             FROM cand c, q),
           top AS (
             SELECT *, CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
             FROM ranked WHERE r <= 10),
           w(r, wt) AS (VALUES $wValues),
           dcgs AS (
             SELECT qid,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(rel * wt ORDER BY r)), (a, b) -> a + b) AS dcg,
               min(CASE WHEN rel = 1 THEN r END) AS first_rel
             FROM top JOIN w USING (r) GROUP BY qid),
           nrel AS (
             SELECT q.qid, CAST(count(c.vec_id) AS BIGINT) AS n_rel
             FROM q LEFT JOIN cand c ON c.label = q.qlabel GROUP BY q.qid),
           idcgs AS (
             SELECT n.qid, n.n_rel,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(wt ORDER BY r)), (a, b) -> a + b) AS idcg
             FROM nrel n JOIN w ON w.r <= least(n.n_rel, 10)
             GROUP BY n.qid, n.n_rel)
           SELECT d.qid, i.n_rel, round(d.dcg, 6) AS dcg,
             round(i.idcg, 6) AS idcg, round(d.dcg / i.idcg, 6) AS ndcg,
             round(COALESCE(CAST(1 AS DOUBLE) / d.first_rel,
               CAST(0 AS DOUBLE)), 6) AS mrr
           FROM dcgs d JOIN idcgs i USING (qid) ORDER BY qid"""
    )
  }
}
