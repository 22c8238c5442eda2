package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity
import graft.operators.Selection
import graft.queries.OracleSql.cosExact

/** Round-7 batch 84: the Hodges–Lehmann robust location estimate, and an
  * LSH-bucket cosine census for the embedding space.
  *
  *  - a40_hodges_lehmann: the HL pseudo-median of the hourly event counts
  *    per type — the lower median of the n(n+1)/2 Walsh averages
  *    (x_i + x_j)/2, i ≤ j. The integer spine: the median is selected on
  *    the SUM domain (x_i + x_j is an exact BIGINT) via the two-level
  *    bucket selection, and the single ÷2 happens after selection — no
  *    float ever enters the rank order. Completes the robust-location
  *    family (a21 mode, a19/a20 medians, a35 Theil–Sen slope).
  *  - v10_lsh_cosine_census: for every pair of embeddings sharing a
  *    16-bit hyperplane-LSH signature (the ann_lsh bucket key — an
  *    equi-join, never all pairs), the exact cosine, bucketed by decile:
  *    pair count, min/max cosine per bin. This is the embedding twin of
  *    t27's MinHash calibration — it measures what cosine range a
  *    same-signature collision actually implies, i.e. whether 16 bits
  *    are enough to make bucket-mates near-duplicates. Cosines are the
  *    ascending-index fold both engines share bit-for-bit, so even the
  *    bin boundaries cannot drift.
  *
  * Scale shape: a40's pair join runs on the calendar-bounded hourly
  * aggregate (broadcast, sf-invariant); v10's pair set is keyed by the
  * signature (at corpus scale: a stored bucketed column), and the census
  * is one hash aggregate on the 20-row bin domain.
  *
  * Reference context: no counterpart; extends the trend/robustness and
  * similarity-diagnostics families.
  */
object Extended84 {
  type Q = (SparkSession, String) => DataFrame

  private def hourly(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))

  val queries: Map[String, Q] = Map(
    "a40_hodges_lehmann" -> ((s, d) => {
      val hr = hourly(s, d)
      val sums = hr.as("a")
        .join(broadcast(hr.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.h") >= col("a.h"))
        .select(col("a.event_type").as("event_type"),
          (col("a.x") + col("b.x")).as("s2"))
      val hist = sums.groupBy("event_type", "s2").agg(count(lit(1)).as("n"))
      val med = Selection.lowerMedian(
        hist, Seq("event_type"), "s2", "n", "med_s2")
      val nW = sums.groupBy("event_type").agg(count(lit(1)).as("n_walsh"))
      med.join(nW, "event_type")
        .select(col("event_type"), col("n_walsh"),
          (col("med_s2").cast("double") / 2.0).as("hl_estimate"))
        .orderBy("event_type")
    }),

    "v10_lsh_cosine_census" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("ev"),
          Similarity.hyperplaneSignature(col("embedding"), dim = 64).as("sig"))
      val pairs = e.as("x").join(e.as("y"),
          col("x.sig") === col("y.sig") && col("x.vec_id") < col("y.vec_id"))
        .select(Similarity.cosine(col("x.ev"), col("y.ev")).as("cos"))
      pairs
        .select(least(floor(col("cos") * 10.0), lit(9.0)).cast("long")
          .as("bin"), col("cos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_pairs"),
          round(min("cos"), 6).as("min_cos"),
          round(max("cos"), 6).as("max_cos"))
        .orderBy("bin")
    })
  )

  private val hourlyCte =
    """hourly AS (
         SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
           CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2)"""

  val oracleSql: Map[String, String] = Map(
    "a40_hodges_lehmann" ->
      s"""WITH $hourlyCte,
         sums AS (
           SELECT a.event_type, a.x + b.x AS s2
           FROM hourly a JOIN hourly b
             ON b.event_type = a.event_type AND b.h >= a.h),
         ranked AS (
           SELECT event_type, s2,
             row_number() OVER (PARTITION BY event_type ORDER BY s2) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
           FROM sums)
         SELECT event_type, m AS n_walsh,
           CAST(s2 AS DOUBLE) / 2.0 AS hl_estimate
         FROM ranked WHERE rn = (m + 1) // 2
         ORDER BY event_type""",
    "v10_lsh_cosine_census" -> {
      val planes = Similarity.planeRows(64, 16).map { case (b, w) =>
        s"($b, ${w.map(_.toString).mkString("[", ",", "]")}::DOUBLE[])"
      }.mkString(",")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings),
         planes(pb, w) AS (VALUES $planes),
         sigs AS (
           SELECT vec_id, CAST(sum(CASE WHEN ${OracleSql.dotFold("ev", "w")} >= 0
                                        THEN 1 << pb ELSE 0 END) AS BIGINT) AS sig
           FROM v CROSS JOIN planes GROUP BY vec_id),
         pairs AS (
           SELECT ${cosExact("x.ev", "y.ev")} AS cos
           FROM v x JOIN sigs sx ON sx.vec_id = x.vec_id
             JOIN sigs sy ON sy.sig = sx.sig
             JOIN v y ON y.vec_id = sy.vec_id
           WHERE x.vec_id < y.vec_id)
         SELECT CAST(least(floor(cos * 10.0), 9.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(cos), 6) AS min_cos,
           round(max(cos), 6) AS max_cos
         FROM pairs GROUP BY 1 ORDER BY bin"""
    }
  )
}
