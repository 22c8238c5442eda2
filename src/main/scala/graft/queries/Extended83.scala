package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 83: grid-bucketed spatial kNN and co-occurrence mining —
  * the candidate-generation patterns every "nearest things" / "things
  * that go together" workload reduces to.
  *
  *  - g11_grid_knn: bounded-radius k-nearest-events for a panel of query
  *    points on the synthetic (value, 4·user_id) plane the g2/g3 family
  *    established. Events are bucketed ONCE into 40-unit grid cells;
  *    each query point explodes to its 3×3 cell ring and the candidate
  *    set is an EQUI-JOIN on the cell key — never a distance test against
  *    the corpus. Ranking is by the exact integer squared distance in
  *    cent units (dx² + dy², both BIGINT — no float comparator anywhere
  *    in the selection), top-5 per query through the bounded-heap
  *    GroupTopK, ties broken by event_id. Semantics: the k nearest
  *    AMONG candidates within the ring (the ring radius bounds the
  *    search — the honest contract of a single-probe grid index; an
  *    expanding-ring variant would recurse, cf. SCALING.md).
  *  - j26_type_cooccurrence_pmi: pointwise mutual information between
  *    event types over the user dimension — for each unordered type
  *    pair, the count of distinct users emitting both, each type's user
  *    count, and PMI = ln(n·c_xy / (c_x·c_y)). The distinct (user, type)
  *    relation is one keyed aggregate; the pair join fans out ≤
  *    |types|² rows per user (domain-, not corpus-, bounded: 5 types →
  *    ≤10 pairs). All counts exact BIGINTs; PMI is one ln of one
  *    division (the a33 parity precedent).
  *
  * Scale shape: g11's per-event work is one cell-key computation and one
  * hash join probe against 45 broadcast ring cells; j26 shuffles the
  * (user, type) distinct once. Both are 100 TB shapes.
  *
  * Reference context: g11 extends the reference's dwithin surface
  * (`feature_table.py` bbox/dwithin) to kNN; j26 has no counterpart and
  * extends the association family (a31 Cramér's V on a contingency
  * table → j26 on the co-occurrence lattice).
  */
object Extended83 {
  type Q = (SparkSession, String) => DataFrame

  /** Query-point panel: in-domain across scale factors (x ∈ value range,
    * y in the low user band present at every sf).
    */
  private val Points = Seq((0L, 100.0, 80.0), (1L, 250.0, 200.0),
    (2L, 400.0, 400.0), (3L, 50.0, 500.0), (4L, 333.0, 120.0))

  private val CellCents = 4000L // 40 units × 100 cents

  val queries: Map[String, Q] = Map(
    "g11_grid_knn" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("xc"),
          (col("user_id") * 400L).as("yc"))
        .withColumn("cx", expr(s"xc div $CellCents"))
        .withColumn("cy", expr(s"yc div $CellCents"))
      val pts = s.createDataFrame(Points).toDF("qid", "qx", "qy")
        .select(col("qid"), (col("qx") * 100).cast("long").as("qxc"),
          (col("qy") * 100).cast("long").as("qyc"))
      // each query probes its 3×3 cell ring: 45 (qid, cell) rows total
      val ring = pts
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("qid"), col("qxc"), col("qyc"),
          (expr(s"qxc div $CellCents") + col("dx")).as("cx"),
          (expr(s"qyc div $CellCents") + col("dy")).as("cy"))
      val cand = ev.join(broadcast(ring), Seq("cx", "cy"))
        .select(col("qid"), col("event_id"),
          ((col("xc") - col("qxc")) * (col("xc") - col("qxc")) +
            (col("yc") - col("qyc")) * (col("yc") - col("qyc"))).as("dist2"))
      graft.plans.GroupTopK.topK(
          cand, Seq("qid"), Seq(("dist2", true), ("event_id", true)), 5)
        .select(col("qid"), col("event_id"), col("dist2"),
          round(sqrt(col("dist2").cast("double")) / 100.0, 4).as("dist"))
        .orderBy("qid", "dist2", "event_id")
    }),

    "j26_type_cooccurrence_pmi" -> ((s, d) => {
      val ut = t(s, d, "events").select("user_id", "event_type").distinct()
      val perType = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
      val n = ut.select(countDistinct("user_id").as("n"))
      val pairs = ut.as("x").join(ut.as("y"), Seq("user_id"))
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
        .agg(count(lit(1)).as("c_ab"))
      pairs
        .join(broadcast(perType.toDF("ta", "c_a")), "ta")
        .join(broadcast(perType.toDF("tb", "c_b")), "tb")
        .crossJoin(broadcast(n))
        .select(col("ta"), col("tb"), col("c_ab"), col("c_a"), col("c_b"),
          col("n"),
          round(log((col("n") * col("c_ab")).cast("double") /
            (col("c_a") * col("c_b")).cast("double")), 6).as("pmi"))
        .orderBy("ta", "tb")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g11_grid_knn" -> {
      val pts = Points.map { case (id, x, y) =>
        s"($id, ${(x * 100).toLong}, ${(y * 100).toLong})"
      }.mkString(", ")
      s"""WITH ev AS (
           SELECT event_id, CAST(round(value * 100) AS BIGINT) AS xc,
             user_id * 400 AS yc
           FROM events),
         q(qid, qxc, qyc) AS (VALUES $pts),
         cand AS (
           SELECT q.qid, ev.event_id,
             (ev.xc - q.qxc) * (ev.xc - q.qxc)
               + (ev.yc - q.qyc) * (ev.yc - q.qyc) AS dist2
           FROM ev JOIN q
             ON ev.xc // $CellCents BETWEEN q.qxc // $CellCents - 1
                                        AND q.qxc // $CellCents + 1
            AND ev.yc // $CellCents BETWEEN q.qyc // $CellCents - 1
                                        AND q.qyc // $CellCents + 1),
         r AS (
           SELECT qid, event_id, dist2,
             row_number() OVER (PARTITION BY qid
               ORDER BY dist2, event_id) AS rn
           FROM cand)
         SELECT CAST(qid AS BIGINT) AS qid, event_id, dist2,
           round(sqrt(CAST(dist2 AS DOUBLE)) / 100.0, 4) AS dist
         FROM r WHERE rn <= 5
         ORDER BY qid, dist2, event_id"""
    },
    "j26_type_cooccurrence_pmi" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
                 FROM ut GROUP BY event_type),
         n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM ut),
         p AS (
           SELECT x.event_type AS ta, y.event_type AS tb,
             CAST(count(*) AS BIGINT) AS c_ab
           FROM ut x JOIN ut y
             ON x.user_id = y.user_id AND x.event_type < y.event_type
           GROUP BY 1, 2)
         SELECT ta, tb, c_ab, a.c AS c_a, b.c AS c_b, n.n AS n,
           round(ln(CAST(n.n * c_ab AS DOUBLE)
             / CAST(a.c * b.c AS DOUBLE)), 6) AS pmi
         FROM p JOIN per a ON a.event_type = ta
           JOIN per b ON b.event_type = tb
           CROSS JOIN n
         ORDER BY ta, tb"""
  )
}
