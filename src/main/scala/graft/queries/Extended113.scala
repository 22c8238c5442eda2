package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Multimodal

/** Round-8 batch 113: consecutive-frame differencing over a REAL codec
  * and the k-related-samples rank test.
  *
  *  - mm9_frame_diff: the scene-change primitive of a video curation
  *    pipeline — per document, two deterministic PNG frames are
  *    synthesized (frame B repeats frame A's seed on every 5th doc, a
  *    static shot; otherwise it jumps by +252, which preserves the
  *    (w, h) = f(seed mod 36) dimensions), REALLY encoded and decoded
  *    through javax.imageio, and reduced to the exact integer sum of
  *    absolute per-channel differences. MAD is one division; the
  *    scene-change verdict is the integer cross-product sad > 64·n.
  *    The oracle restates BOTH pixel streams from the public splitmix64
  *    generator with NO codec (the mm2 discipline) — a stub decoder
  *    cannot match, and the planted static shots must land at exactly
  *    sad = 0.
  *  - a59_friedman_test: Friedman's test across all event types blocked
  *    by day (are the k types' daily volumes drawn from the same
  *    distribution, judged WITHIN each day?). Complete blocks only
  *    (days where all k types traded). DOUBLED midranks inside each
  *    day-block are exact integers (2·mid = 2·below + ties + 1 from two
  *    day-keyed windows); with R'_j = Σ 2·rank and A' = Σ(2·rank)², the
  *    tie-corrected statistic is the exact-integer identity
  *    χ²_F = (k−1)·Σ_j(R'_j − n(k+1))² / (A' − n·k·(k+1)²) — ONE
  *    division. This closes the blocked-design gap next to a56
  *    (Kruskal–Wallis is unblocked; Friedman controls for the day).
  *
  * Scale shape: mm9 is mapPartitions decode with no shuffle and a
  * media_id equi-join of the two frame relations; a59's windows are
  * keyed by day (k rows per partition key — never a global window), and
  * the final statistic is one aggregate over exact integer sums.
  *
  * Reference context: no counterpart; extends the multimodal family
  * (mm2/mm5/mm7/mm8) and the a-family testing layer (a56, a48).
  */
object Extended113 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  val queries: Map[String, Q] = Map(
    // ---- mm9: real-decode consecutive-frame SAD / scene change ----
    "mm9_frame_diff" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val seedB = when(pmod(col("doc_id"), lit(5)) === 0, col("doc_id"))
        .otherwise(col("doc_id") + 252L)
      // both frames synthesized in ONE pass (no blob-carrying join; the
      // former two-stream form shuffled every PNG through a sort-merge
      // join on media_id just to re-pair same-row frames)
      Multimodal.frameDiffStats(Multimodal.synthesizeFramePairsSeeded(
          docs, "doc_id", col("doc_id"), seedB))
        .select(col("media_id"), col("width"), col("height"), col("sad"),
          round(col("sad").cast("double") / col("n_vals").cast("double"), 4)
            .as("mad"),
          (col("sad") > lit(64L) * col("n_vals")).as("scene_change"))
        .orderBy("media_id")
    }),

    // ---- a59: Friedman rank test blocked by day ----
    "a59_friedman_test" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val kDf = dy.agg(countDistinct("event_type").as("k"))
      val completeDays = dy.groupBy("day").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(kDf)).filter(col("c") === col("k"))
        .select("day", "k")
      val blocks = dy.join(completeDays, "day")
      // doubled midrank inside each day-block: 2·below + ties + 1 —
      // exact integers from two DAY-KEYED windows (k rows per key)
      val r2 = blocks
        .withColumn("rk", rank().over(
          Window.partitionBy("day").orderBy("y")))
        .withColumn("ties", count(lit(1)).over(
          Window.partitionBy("day", "y")))
        .withColumn("r2", lit(2L) * col("rk") + col("ties") - 2L + 1L)
      val perType = r2.groupBy("event_type", "k")
        .agg(sum("r2").as("rj2"), count(lit(1)).as("n"),
          sum(dec(col("r2")) * dec(col("r2"))).as("a2part"))
      perType.groupBy("k")
        .agg(max("n").as("n_blocks"),
          sum(dec(col("rj2") - col("n") * (col("k") + 1L)) *
            dec(col("rj2") - col("n") * (col("k") + 1L))).as("num"),
          sum("a2part").as("a2"))
        .select(col("k").as("k_types"), col("n_blocks"),
          round(((dec(col("k") - 1L) * col("num")).cast("double")) /
            (col("a2") - dec(col("n_blocks")) * dec(col("k")) *
              dec(col("k") + 1L) * dec(col("k") + 1L)).cast("double"), 6)
            .as("chi2_f"))
    })
  )

  val oracleSql: Map[String, String] = {
    import OracleSql.splitmixList
    Map(
      "mm9_frame_diff" -> {
        def stream(seed: String) = {
          val seeds =
            s"list_transform(range(0, n), i -> ($seed*1000003 + i)::HUGEINT)"
          s"list_transform(${splitmixList(seeds)}, z -> z % 256)"
        }
        s"""WITH d AS (
             SELECT doc_id, 3 + (doc_id % 6) AS w, 3 + ((doc_id // 6) % 6) AS h,
               CASE WHEN doc_id % 5 = 0 THEN doc_id
                 ELSE doc_id + 252 END AS seed_b
             FROM documents),
           dims AS (SELECT doc_id, w, h, seed_b, w*h*3 AS n FROM d),
           px AS (
             SELECT doc_id, w, h, n,
               ${stream("doc_id")} AS va,
               ${stream("seed_b")} AS vb
             FROM dims),
           sadt AS (
             SELECT doc_id, w, h, n,
               CAST(list_aggregate(list_transform(range(1, n + 1),
                 i -> abs(va[i] - vb[i])), 'sum') AS BIGINT) AS sad
             FROM px)
           SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
             sad, round(CAST(sad AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mad,
             sad > 64 * n AS scene_change
           FROM sadt ORDER BY media_id"""
      },
      "a59_friedman_test" ->
        """WITH dy AS (
             SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
           k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
                 FROM dy),
           cd AS (
             SELECT day FROM dy, k GROUP BY day, k.k
             HAVING count(*) = k.k),
           blocks AS (SELECT dy.* FROM dy JOIN cd USING (day)),
           r AS (
             SELECT event_type,
               2 * CAST(rank() OVER (PARTITION BY day ORDER BY y) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY day, y) AS BIGINT) - 1
                 AS r2
             FROM blocks),
           pt AS (
             SELECT event_type, CAST(sum(r2) AS BIGINT) AS rj2,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(r2 AS HUGEINT) * r2) AS a2part
             FROM r GROUP BY event_type)
           SELECT k.k AS k_types, max(pt.n) AS n_blocks,
             round(CAST((k.k - 1) * sum(CAST(pt.rj2 - pt.n * (k.k + 1)
                 AS HUGEINT) * (pt.rj2 - pt.n * (k.k + 1))) AS DOUBLE)
               / CAST(sum(pt.a2part) - CAST(max(pt.n) AS HUGEINT) * k.k
                 * (k.k + 1) * (k.k + 1) AS DOUBLE), 6) AS chi2_f
           FROM pt, k GROUP BY k.k"""
    )
  }
}
