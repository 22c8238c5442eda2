package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-2 surface extensions, batch 8: explicit null-ordering sorts,
  * FILTER-clause / HAVING aggregates, and product-quantization ANN — each
  * with a DuckDB oracle.
  */
object Extended8 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- sort battery: mixed directions with explicit null placement ----
    // nulls manufactured deterministically (zero discounts), then every
    // combination: asc_nulls_first / asc_nulls_last / desc_nulls_first.
    "f15_sort_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("d_null"),
          col("l_quantity"))
        .orderBy(col("d_null").asc_nulls_first, col("l_quantity").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(2000)),

    // ---- FILTER-clause aggregates + HAVING over grouped distinct ----
    "q7_filtered_agg" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag,
          count(*) AS n,
          count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          count(DISTINCT l_suppkey) AS n_supp,
          CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
        FROM v_lineitem
        GROUP BY l_returnflag
        HAVING count(DISTINCT l_suppkey) > 1
        ORDER BY l_returnflag""")
    }),

    // ---- product-quantization ANN: encode -> table scan -> exact re-rank ----
    // Completes the ANN family (brute / LSH / IVF / PQ). Codebooks are
    // k-means-trained (two deterministic distributed Lloyd iterations per
    // subspace, fixed-point means). The oracle restates the training, the
    // lowest-id-on-tie argmin encode, and the ascending-order distance
    // folds, so every double is bit-identical through the candidate
    // boundary.
    // codebooks go through a persist → reload round trip (AnnStore), so
    // the oracle hash also certifies artifact fidelity — see ann_ivf_topk
    "ann_pq_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
      val rest = e.filter(col("vec_id") =!= 0)
      val idxPath = Scratch.dir("ann_pq", d)
      graft.store.AnnStore.savePq(s,
        Similarity.buildPqIndex(rest, "vec_id", "embedding", qv.length,
          m = 8, ksub = 16, trainIters = 2), idxPath)
      Similarity.pqTopKWith(graft.store.AnnStore.loadPq(s, idxPath),
          rest, "vec_id", "embedding", qv, k = 10, refine = 50)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f15_sort_battery" ->
      """SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS d_null, l_quantity
         FROM lineitem
         ORDER BY d_null ASC NULLS FIRST, l_quantity DESC,
           l_orderkey ASC, l_linenumber ASC
         LIMIT 2000""",
    "q7_filtered_agg" ->
      """SELECT l_returnflag,
           count(*) AS n,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
         FROM lineitem
         GROUP BY l_returnflag
         HAVING count(DISTINCT l_suppkey) > 1
         ORDER BY l_returnflag""",
    "ann_pq_topk" -> {
      import OracleSql.cosExact
      // d2 between subvector j of `vec` and an 8-element codebook entry
      // `sv` — ascending-i fold, (a-b)*(a-b), identical to AnnKernel.l2
      def d2(vec: String) =
        s"""list_reduce(list_transform(range(1, 9),
               i -> ($vec[j*8+i] - sv[i]) * ($vec[j*8+i] - sv[i])),
               (a, b) -> a + b)"""
      // one per-subspace L2 Lloyd iteration (Similarity.trainCodebook):
      // strict-< lowest-cid argmin assignment, fixed-point per-dimension
      // means (floor(x*2^24) summed as BIGINT — commutes, so the
      // distributed sum matches bit-for-bit), empty cells keep their seed
      def lloyd(prev: String, enc: String, upd: String, next: String) =
        s"""$enc AS (SELECT vec_id, j, cid FROM (
               SELECT vec_id, j, cid,
                 row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
               FROM (SELECT vec_id, j, cid, ${d2("ev")} AS d2
                     FROM v CROSS JOIN $prev)) WHERE rn = 1),
         $upd AS (SELECT j, cid, p,
               CAST(sum(CAST(floor(ev[j*8+p] * 16777216) AS BIGINT)) AS DOUBLE)
                 / count(*) / 16777216.0 AS svp
             FROM $enc JOIN v USING (vec_id), range(1, 9) AS r(p)
             GROUP BY j, cid, p),
         $next AS (SELECT $prev.j, $prev.cid, coalesce(u.sv, $prev.sv) AS sv
             FROM $prev LEFT JOIN (
               SELECT j, cid, list(svp ORDER BY p) AS sv FROM $upd
               GROUP BY j, cid) u
             USING (j, cid))"""
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0),
         v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings WHERE vec_id <> 0),
         tr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, ev AS cv
                FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT 16)),
         subs AS (SELECT unnest(range(0, 8)) AS j),
         cb0 AS (SELECT j, cid, cv[j*8+1:(j+1)*8] AS sv
                 FROM tr CROSS JOIN subs),
         ${lloyd("cb0", "e0", "u0", "cb1")},
         ${lloyd("cb1", "e1", "u1", "cb2")},
         enc AS (
           SELECT vec_id, j, cid FROM (
             SELECT vec_id, j, cid,
               row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
             FROM (SELECT vec_id, j, cid, ${d2("ev")} AS d2
                   FROM v CROSS JOIN cb2))
           WHERE rn = 1),
         qd AS (
           SELECT j, cid, ${d2("qv")} AS d2
           FROM q CROSS JOIN cb2),
         ad AS (
           SELECT e.vec_id, list_reduce(list(t.d2 ORDER BY e.j), (a, b) -> a + b) AS ad
           FROM enc e JOIN qd t ON e.j = t.j AND e.cid = t.cid
           GROUP BY e.vec_id),
         cand AS (SELECT vec_id FROM ad ORDER BY ad, vec_id LIMIT 50)
         SELECT v.vec_id, round(${cosExact("ev", "qv")}, 4) AS sim
         FROM v JOIN cand USING (vec_id) CROSS JOIN q
         ORDER BY ${cosExact("ev", "qv")} DESC, v.vec_id LIMIT 10"""
    }
  )
}
