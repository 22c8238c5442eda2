package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-8 batch 115: density-based clustering census and the LSH
  * bit-width planning curve.
  *
  *  - g13_dbscan_core: the DBSCAN core/border/noise census on the
  *    g2/g11 cent plane (x = value cents, y = 400·user_id), eps = 500 
  *    cents, minPts = 4 (self included — the textbook |N_eps(p)| rule).
  *    Cell width = eps, so each point's eps-ball is covered by its
  *    3×3 cell ring: neighbor pairs come from a ring EQUI-join (the
  *    g11 spine — never an all-pairs distance test), the eps test is
  *    the exact integer dx²+dy² ≤ eps², core status is one count,
  *    border status one semi-join against the core set, and the census
  *    is three exact counts. This is the classification pass of DBSCAN
  *    — the expansion to full cluster labels is g10's CC machinery;
  *    the census is what a density-parameter sweep actually reads.
  *    Per-cell pair work is density-bounded (the documented g10/g11
  *    contract).
  *  - v17_lsh_recall_curve: recall@10 of hyperplane-LSH bucketing as a
  *    function of signature width (4/8/12/16 bits) for the standard
  *    query vector — the "how many hyperplanes do I need?" planning
  *    query, the LSH twin of v11's IVF probe curve. Plane b sets bit b,
  *    so the width-w signature is sig16 & (2^w − 1): ONE 16-bit
  *    signature pass serves all four widths (at corpus scale: one
  *    stored column, four masks). Ground truth is the ann_brute top-10
  *    under the pinned exact-cosine order; recall counts survivors of
  *    the same-bucket filter — pure integer membership arithmetic.
  *
  * Scale shape: g13 is scan → cell keys → ring equi-join → two keyed
  * aggregates; v17 is one signature scan, a 4× width explode (four
  * masks of one stored column at scale), a broadcast 10-row truth set
  * and one hash aggregate. No windows, no driver loops.
  *
  * Reference context: g13 extends the reference's spatial surface
  * (dwithin candidates → density classification); v17 has no
  * counterpart and completes the index-audit family (v11, v12, t27).
  */
object Extended115 {
  type Q = (SparkSession, String) => DataFrame

  private val EpsCents = 500L
  private val MinPts = 4L

  val queries: Map[String, Q] = Map(
    // ---- g13: DBSCAN core/border/noise census via cell-ring join ----
    // (the census itself lives in Spatial.dbscanCensus since round 9,
    // behind the hard ring-candidate budget guard; same plan, same rows)
    "g13_dbscan_core" -> ((s, d) => {
      val pts = t(s, d, "events")
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("xc"),
          (col("user_id") * 400L).as("yc"))
      graft.spatial.Spatial.dbscanCensus(pts, "event_id", "xc", "yc",
        EpsCents, MinPts)
    }),

    // ---- v17: LSH recall@10 vs signature width ----
    "v17_lsh_recall_curve" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          Similarity.hyperplaneSignature(col("embedding"), dim = 64)
            .as("sig16"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("sig16").as("qsig"))
      val rest = e.filter(col("vec_id") =!= 0)
      val top10 = rest.crossJoin(broadcast(q))
        .select(col("vec_id"), Similarity.cosine(col("v"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(10)
        .select(col("vec_id"), lit(1L).as("hit"))
      val exploded = rest.crossJoin(broadcast(q.select(col("qsig"))))
        .select(col("vec_id"), col("sig16"), col("qsig"),
          explode(array(lit(4), lit(8), lit(12), lit(16))).as("n_bits"))
        .filter(expr("(sig16 & (shiftleft(1L, n_bits) - 1)) = " +
          "(qsig & (shiftleft(1L, n_bits) - 1))"))
      exploded.join(broadcast(top10), Seq("vec_id"), "left")
        .groupBy("n_bits")
        .agg(count(lit(1)).as("n_candidates"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("n_bits"), col("n_candidates"), col("hits"),
          round(col("hits").cast("double") / 10.0, 4).as("recall_at_10"))
        .orderBy("n_bits")
    })
  )

  val oracleSql: Map[String, String] = {
    import OracleSql.cosExact
    val planes = Similarity.planeRows(64, 16).map { case (b, w) =>
      s"($b, ${w.map(_.toString).mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString(",")
    Map(
      "g13_dbscan_core" ->
        s"""WITH p AS (
             SELECT event_id, CAST(round(value * 100) AS BIGINT) AS xc,
               user_id * 400 AS yc
             FROM events),
           c AS (SELECT *, xc // $EpsCents AS cx, yc // $EpsCents AS cy
                 FROM p),
           offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
             (1,-1),(1,0),(1,1)),
           nbr AS (
             SELECT a.event_id AS ai, b.event_id AS bi
             FROM c a CROSS JOIN offs o
             JOIN c b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
             WHERE (a.xc - b.xc) * (a.xc - b.xc)
               + (a.yc - b.yc) * (a.yc - b.yc)
               <= ${EpsCents * EpsCents}),
           core AS (
             SELECT ai FROM nbr GROUP BY ai HAVING count(*) >= $MinPts),
           border AS (
             SELECT DISTINCT n.ai FROM nbr n JOIN core k ON n.bi = k.ai
             WHERE n.ai NOT IN (SELECT ai FROM core))
           SELECT CAST($EpsCents AS BIGINT) AS eps_cents,
             CAST($MinPts AS BIGINT) AS min_pts,
             (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_points,
             (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
             (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
             (SELECT CAST(count(*) AS BIGINT) FROM p)
               - (SELECT CAST(count(*) AS BIGINT) FROM core)
               - (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_noise""",
      "v17_lsh_recall_curve" ->
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings),
           planes(pb, w) AS (VALUES $planes),
           sigs AS (
             SELECT vec_id,
               CAST(sum(CASE WHEN ${OracleSql.dotFold("ev", "w")} >= 0
                 THEN 1 << pb ELSE 0 END) AS BIGINT) AS sig
             FROM v CROSS JOIN planes GROUP BY vec_id),
           q AS (SELECT v.ev AS qv, s.sig AS qsig
                 FROM v JOIN sigs s USING (vec_id) WHERE v.vec_id = 0),
           top10 AS (
             SELECT vec_id FROM v, q WHERE vec_id <> 0
             ORDER BY ${cosExact("ev", "qv")} DESC, vec_id LIMIT 10),
           widths(n_bits) AS (VALUES (4), (8), (12), (16)),
           cand AS (
             SELECT w.n_bits, s.vec_id
             FROM sigs s CROSS JOIN widths w CROSS JOIN q
             WHERE s.vec_id <> 0
               AND (s.sig & ((1 << w.n_bits) - 1))
                 = (q.qsig & ((1 << w.n_bits) - 1)))
           SELECT n_bits, CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM top10)
               THEN 1 ELSE 0 END) AS BIGINT) AS hits,
             round(CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM top10)
               THEN 1 ELSE 0 END) AS DOUBLE) / 10.0, 4) AS recall_at_10
           FROM cand GROUP BY n_bits ORDER BY n_bits"""
    )
  }
}
