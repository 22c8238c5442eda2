package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-8 batch 116: the PQ reconstruction-distortion audit and the
  * two-proportion A/B gate.
  *
  *  - v18_pq_distortion: how lossy is the ann_pq configuration (m = 8
  *    subspaces × 16 codewords)? Every corpus vector is encoded by the
  *    SAME trained codebooks the ann_pq query uses (two deterministic
  *    Lloyd iterations, strict-< lowest-cid argmin) and reconstructed
  *    from its codewords; the cosine between original and
  *    reconstruction is bucketed into 0.05-wide bins (count / min /
  *    max per bin — the v10 census discipline, so no cross-vector
  *    float sum enters the parity surface). Encode runs RELATIONALLY:
  *    the 128-row codebook broadcasts, d² is the ascending zip fold
  *    shared with AnnKernel.l2, argmin is one struct-min. This
  *    completes the index-audit family: v11 (IVF probe recall), v12
  *    (centroid balance), v17 (LSH width), v18 (PQ loss).
  *  - a61_two_proportion: the classic two-proportion z-test between
  *    the md5-coin halves of the corpus (t7's engine-portable split)
  *    on the tp36 length-gate pass rate — the A/B readout run before
  *    shipping a curation change. Counts are exact BIGINTs; p̂, the
  *    pooled variance and z form one fixed IEEE dag with a single
  *    terminal sqrt.
  *
  * Scale shape: v18 is one scan × broadcast(128 codebook rows) →
  * (vec, subspace)-keyed struct-min → one regroup per vector → a
  * 20-bin census; a61 is explode → doc-keyed aggregate → ONE global
  * aggregate. No windows, no unbounded driver state (the codebook is
  * a k·m-bounded artifact, the IVF/SQ8 precedent).
  *
  * Reference context: no counterpart; extends the vector-index audit
  * layer beside ann_pq (Extended8) and the testing layer (a39, a48).
  */
object Extended116 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- v18: PQ reconstruction distortion census ----
    "v18_pq_distortion" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val rest = e.filter(col("vec_id") =!= 0)
      val idx = Similarity.buildPqIndex(rest, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, trainIters = 2)
      // the trained codebook as a 128-row broadcast relation
      val cbRows = for {
        j <- idx.codebook.indices
        c <- idx.codebook(j).indices
      } yield (j, c, idx.codebook(j)(c).toSeq)
      val cb = s.createDataFrame(cbRows).toDF("j", "cid", "sv")
      val v = rest.select(col("vec_id"),
        col("embedding").cast("array<double>").as("ev"))
      // d² per (vector, subspace, codeword): the ascending zip fold the
      // kernel and the oracle share; argmin = struct-min (strict <,
      // lowest cid on ties — fold order makes that the min struct)
      val scored = v.crossJoin(broadcast(cb))
        .select(col("vec_id"), col("ev"), col("j"), col("cid"), col("sv"),
          expr("aggregate(zip_with(slice(ev, j*8+1, 8), sv, " +
            "(a, b) -> (a - b) * (a - b)), 0.0d, (acc, x) -> acc + x)")
            .as("d2"))
      val enc = scored.groupBy("vec_id", "j")
        .agg(min(struct(col("d2"), col("cid"), col("sv"))).as("m"))
      val recon = enc.groupBy("vec_id")
        .agg(flatten(sort_array(collect_list(
          struct(col("j"), col("m.sv").as("sv"))))("sv")).as("rv"))
      val cosed = v.join(recon, "vec_id")
        .select(col("vec_id"), Similarity.cosine(col("ev"), col("rv")).as("c"))
      cosed
        .select(least(floor(col("c") * 20.0), lit(19.0)).cast("long")
          .as("bin"), col("c"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_vecs"),
          round(min("c"), 6).as("min_cos"), round(max("c"), 6).as("max_cos"))
        .orderBy("bin")
    }),

    // ---- a61: two-proportion z-test between md5-coin halves ----
    "a61_two_proportion" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(col("doc_id"),
          (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
            < "8").cast("long").as("a"),
          size(split(col("text"), " ")).cast("long").as("nw"))
        .select(col("a"),
          (col("nw") >= 20 && col("nw") <= 1000).cast("long").as("pass"))
      words.agg(
          sum(col("a")).as("n1"), sum(col("a") * col("pass")).as("x1"),
          sum(lit(1L) - col("a")).as("n2"),
          sum((lit(1L) - col("a")) * col("pass")).as("x2"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          { val p1 = col("x1").cast("double") / col("n1").cast("double")
            val p2 = col("x2").cast("double") / col("n2").cast("double")
            val pp = (col("x1") + col("x2")).cast("double") /
              (col("n1") + col("n2")).cast("double")
            val se = sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n2").cast("double")))
            struct(round(p1, 6).as("rate_a"), round(p2, 6).as("rate_b"),
              round((p1 - p2) / se, 6).as("z")) }.as("m"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          col("m.rate_a").as("rate_a"), col("m.rate_b").as("rate_b"),
          col("m.z").as("z"))
    })
  )

  val oracleSql: Map[String, String] = {
    import OracleSql.cosExact
    // the ann_pq training replay (Extended8), verbatim: two Lloyd
    // iterations over per-subspace codebooks seeded from the 16
    // lowest-id vectors
    def d2(vec: String) =
      s"""list_reduce(list_transform(range(1, 9),
             i -> ($vec[j*8+i] - sv[i]) * ($vec[j*8+i] - sv[i])),
             (a, b) -> a + b)"""
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
    Map(
      "v18_pq_distortion" ->
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings WHERE vec_id <> 0),
           tr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                    ev AS cv
                  FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT 16)),
           subs AS (SELECT unnest(range(0, 8)) AS j),
           cb0 AS (SELECT j, cid, cv[j*8+1:(j+1)*8] AS sv
                   FROM tr CROSS JOIN subs),
           ${lloyd("cb0", "e0", "u0", "cb1")},
           ${lloyd("cb1", "e1", "u1", "cb2")},
           enc AS (
             SELECT vec_id, j, sv FROM (
               SELECT vec_id, j, cid, sv,
                 row_number() OVER (PARTITION BY vec_id, j
                   ORDER BY d2, cid) AS rn
               FROM (SELECT vec_id, j, cid, sv, ${d2("ev")} AS d2
                     FROM v CROSS JOIN cb2)) WHERE rn = 1),
           recon AS (
             SELECT vec_id, flatten(list(sv ORDER BY j)) AS rv
             FROM enc GROUP BY vec_id),
           cosed AS (
             SELECT v.vec_id, ${cosExact("v.ev", "r.rv")} AS c
             FROM v JOIN recon r ON v.vec_id = r.vec_id)
           SELECT CAST(least(floor(c * 20.0), 19.0) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_vecs,
             round(min(c), 6) AS min_cos, round(max(c), 6) AS max_cos
           FROM cosed GROUP BY 1 ORDER BY bin""",
      "a61_two_proportion" ->
        """WITH f AS (
             SELECT CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                 AS BIGINT) AS a,
               CAST(len(string_split(text, ' ')) BETWEEN 20 AND 1000
                 AS BIGINT) AS pass
             FROM documents),
           agg AS (
             SELECT CAST(sum(a) AS BIGINT) AS n1,
               CAST(sum(a * pass) AS BIGINT) AS x1,
               CAST(sum(1 - a) AS BIGINT) AS n2,
               CAST(sum((1 - a) * pass) AS BIGINT) AS x2
             FROM f)
           SELECT n1, x1, n2, x2,
             round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate_a,
             round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_b,
             round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               / sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                 * (CAST(1 AS DOUBLE) - CAST(x1 + x2 AS DOUBLE)
                    / CAST(n1 + n2 AS DOUBLE))
                 * (CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    + CAST(1 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6) AS z
           FROM agg"""
    )
  }
}
