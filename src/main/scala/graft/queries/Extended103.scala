package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 103: embedding-space quality audits — cluster
  * separation and random-projection distortion — joining v11 (IVF probe
  * recall) and v12 (centroid balance) in the vector-audit family.
  *
  *  - v13_silhouette: the centroid (simplified) silhouette per label —
  *    a(i) = distance to the OWN label centroid, b(i) = distance to the
  *    nearest OTHER centroid, s(i) = (b−a)/max(a,b), averaged per label.
  *    The exact spine: coordinates in milli-units (the v5 discipline),
  *    and the centroid is kept as the RATIONAL (S⃗, n) rather than a
  *    rounded mean, so n²·dist² = Σ_j (n·x_j − S_j)² is an exact BIGINT;
  *    the only floats are one sqrt + one division per (point, centroid)
  *    and the per-label mean folded in vec_id order (pinned-fold
  *    discipline). Plan: one posexplode scan → label-keyed centroid
  *    aggregate (tiny, broadcast) → pos-keyed join + hash aggregate —
  *    points × L_labels intermediate rows, never points × points.
  *  - v14_jl_distortion: the Johnson–Lindenstrauss audit — project
  *    64-d milli-vectors to 16-d with a deterministic Rademacher matrix
  *    (sign = parity of splitmix64(j·64 + pos) — the tp28 stream, so
  *    the oracle replays the same bits via HUGEINT arithmetic), then
  *    report how the squared-norm ratio ‖y‖²/(k·‖x‖²) spreads. Each
  *    y_j is an exact BIGINT (signed sum of milli coordinates); min /
  *    max / band counts are order-independent, so no float fold is
  *    needed at all. JL says the ratio concentrates near 1 — the audit
  *    a pipeline runs before trusting a projected ANN index.
  *
  * Scale shape: v13 is points × labels (labels ≈ dozens); v14 is one
  * scan with a k×d per-row kernel — both embarrassingly parallel, no
  * windows, no driver state beyond the broadcast centroid table.
  *
  * Reference context: no counterpart; extends the v-family embedding
  * audits.
  */
object Extended103 {
  type Q = (SparkSession, String) => DataFrame

  /** splitmix64 as a Column (native expression, JVM wrap-around). */
  private def sm(c: Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.SplitMix64(ColumnBridge.expression(c.cast("long"))))
  }

  private def milli(vec: Column): Column =
    transform(vec.cast("array<double>"), e => round(e * 1000).cast("long"))

  val queries: Map[String, Q] = Map(
    // ---- v13: centroid silhouette per label ----
    "v13_silhouette" -> ((s, d) => {
      val pts = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"), milli(col("embedding")).as("xs"))
      val ex = pts.select(col("vec_id"), col("label"),
        posexplode(col("xs")).as(Seq("pos", "x")))
      val cent = ex.groupBy(col("label").as("clabel"), col("pos"))
        .agg(sum("x").as("sv"), count(lit(1)).as("n"))
      // n²·dist²(point, centroid) = Σ_j (n·x_j − S_j)² — exact BIGINT
      // (bound: (n·max|x_milli|)²·dims < 2^63 until n·max|x| ≈ 3.8·10⁸)
      val q = ex.join(cent, Seq("pos"))
        .groupBy("vec_id", "label", "clabel")
        .agg(sum((col("n") * col("x") - col("sv")) *
          (col("n") * col("x") - col("sv"))).as("q2"),
          first("n").as("n"))
        .withColumn("dist", sqrt(col("q2").cast("double")) / col("n").cast("double"))
      val ab = q.groupBy("vec_id", "label").agg(
        min(when(col("clabel") === col("label"), col("dist"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
      val sil = ab.withColumn("s",
        when(greatest(col("a"), col("b")) > 0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)))
      sil.groupBy("label")
        .agg(sort_array(collect_list(struct(col("vec_id"), col("s")))).as("arr"))
        .select(col("label"), size(col("arr")).cast("long").as("n_points"),
          round(aggregate(transform(col("arr"), x => x("s")), lit(0.0),
            (acc, x) => acc + x) / size(col("arr")).cast("double"), 6)
            .as("mean_silhouette"))
        .orderBy("label")
    }),

    // ---- v14: JL random-projection distortion audit ----
    "v14_jl_distortion" -> ((s, d) => {
      val k = 16
      val pts = t(s, d, "embeddings")
        .select(col("vec_id"), milli(col("embedding")).as("xs"))
      // y_j = Σ_pos sign(j, pos)·x_pos with sign = ±1 from the splitmix
      // parity of (j·64 + pos) — exact BIGINT per component
      def yj(j: Int): Column = aggregate(
        zip_with(col("xs"), sequence(lit(0), size(col("xs")) - 1),
          (x, p) => when(sm(lit(j.toLong * 64L) + p.cast("long")) % 2L === 0L,
            x).otherwise(-x)),
        lit(0L), (acc, v) => acc + v)
      val projected = pts.select(col("vec_id"),
        aggregate(transform(col("xs"), x => x * x), lit(0L),
          (acc, v) => acc + v).as("qx"),
        array((0 until k).map(yj): _*).as("ys"))
      val ratios = projected
        .filter(col("qx") > 0)
        .withColumn("qy", aggregate(transform(col("ys"), y => y * y),
          lit(0L), (acc, v) => acc + v))
        .withColumn("ratio",
          col("qy").cast("double") / (lit(k) * col("qx")).cast("double"))
      ratios.agg(
        count(lit(1)).as("n"),
        round(min("ratio"), 6).as("min_ratio"),
        round(max("ratio"), 6).as("max_ratio"),
        sum(when(col("ratio") < 0.75, 1L).otherwise(0L)).as("n_low"),
        sum(when(col("ratio") > 1.25, 1L).otherwise(0L)).as("n_high"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "v13_silhouette" ->
      """WITH pts AS (
           SELECT vec_id, label,
             [CAST(round(x * 1000) AS BIGINT)
              for x in CAST(embedding AS DOUBLE[])] AS xs
           FROM embeddings),
         ex AS (
           SELECT vec_id, label, i AS pos, xs[i] AS x
           FROM pts, range(1, 65) t(i)),
         cent AS (
           SELECT label AS clabel, pos, CAST(sum(x) AS BIGINT) AS sv,
             CAST(count(*) AS BIGINT) AS n
           FROM ex GROUP BY label, pos),
         q AS (
           SELECT vec_id, ex.label, clabel,
             CAST(sum((n * x - sv) * (n * x - sv)) AS BIGINT) AS q2,
             CAST(max(n) AS BIGINT) AS n
           FROM ex JOIN cent USING (pos)
           GROUP BY vec_id, ex.label, clabel),
         ab AS (
           SELECT vec_id, label,
             min(CASE WHEN clabel = label
               THEN sqrt(CAST(q2 AS DOUBLE)) / CAST(n AS DOUBLE) END) AS a,
             min(CASE WHEN clabel <> label
               THEN sqrt(CAST(q2 AS DOUBLE)) / CAST(n AS DOUBLE) END) AS b
           FROM q GROUP BY vec_id, label),
         sil AS (
           SELECT vec_id, label,
             CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
               ELSE 0.0 END AS s
           FROM ab)
         SELECT label, CAST(count(*) AS BIGINT) AS n_points,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(s ORDER BY vec_id)), (x, y) -> x + y)
             / CAST(count(*) AS DOUBLE), 6) AS mean_silhouette
         FROM sil GROUP BY label ORDER BY label""",
    "v14_jl_distortion" -> {
      // sign stream: splitmix64(j·64 + pos), parity decides ±1
      val seeds = "list_transform(range(0, 64), p -> (j*64 + p)::HUGEINT)"
      s"""WITH pts AS (
           SELECT vec_id,
             [CAST(round(x * 1000) AS BIGINT)
              for x in CAST(embedding AS DOUBLE[])] AS xs
           FROM embeddings),
         signs AS (
           SELECT j, list_transform(${OracleSql.splitmixList(seeds)},
             z -> CASE WHEN z % 2 = 0 THEN 1 ELSE -1 END) AS sg
           FROM range(0, 16) t(j)),
         comp AS (
           SELECT vec_id, j,
             CAST(list_reduce(list_transform(range(1, 65),
               i -> xs[i] * sg[i]), (a, b) -> a + b) AS BIGINT) AS y
           FROM pts CROSS JOIN signs),
         norms AS (
           SELECT vec_id,
             CAST(list_reduce(list_transform(xs, x -> x * x),
               (a, b) -> a + b) AS BIGINT) AS qx
           FROM pts),
         ry AS (
           SELECT vec_id, CAST(sum(y * y) AS BIGINT) AS qy
           FROM comp GROUP BY vec_id),
         ratios AS (
           SELECT n.vec_id,
             CAST(qy AS DOUBLE) / CAST(16 * qx AS DOUBLE) AS ratio
           FROM norms n JOIN ry USING (vec_id) WHERE qx > 0)
         SELECT CAST(count(*) AS BIGINT) AS n,
           round(min(ratio), 6) AS min_ratio,
           round(max(ratio), 6) AS max_ratio,
           CAST(count(*) FILTER (WHERE ratio < 0.75) AS BIGINT) AS n_low,
           CAST(count(*) FILTER (WHERE ratio > 1.25) AS BIGINT) AS n_high
         FROM ratios"""
    }
  )
}
