package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.spatial.ZOrder

/** Round-8 batch 105: geohash cell encoding and the single-outlier test —
  * one geo-layout staple, one monitoring staple.
  *
  *  - g12_geohash_cells: base-32 geohash (6 characters = 30 bits) of the
  *    synthetic event coordinates (the g8 convention: value→lon,
  *    user_id→lat), with the top cells and their 3-char parents.
  *    Geohash is the STRING face of the same Morton curve g8 lays files
  *    out by: bit 29 is the high longitude bit, so the code is
  *    [[ZOrder.interleave]] with lon in the odd slot, and every prefix
  *    is a containing cell — the property that makes prefix BETWEEN
  *    scans work as bbox pruning on a plain string column. The spine is
  *    INTEGER end-to-end: quantization is `(deg_scaled · 2¹⁵) div span`
  *    (integer div, no float rounding seam), the interleave is the
  *    codegen'd shift/or chain, and the base-32 digits are substring
  *    lookups — no UDF anywhere.
  *  - a52_grubbs: Grubbs' max-normed-residual test on the per-type
  *    daily cent volumes — G = max|yₜ−ȳ| / s. The exact spine: the
  *    deviation argmax uses |n·yₜ − Σy| (exact integers — no float
  *    compare decides WHICH day is flagged, the Selection-discipline
  *    trick), the flagged day resolves ties by earliest day via a
  *    second integer aggregate, and G = maxdev / (n·s) with
  *    s = √((n·Σy²−(Σy)²)/(n·(n−1))) — one fixed dag over exact
  *    integers (DECIMAL/HUGEINT intermediates, overflow-loud).
  *
  * Scale shape: g12 is one scan → hash aggregate on a 2³⁰-bounded cell
  * domain → k-bounded TakeOrdered; a52 is calendar-bounded aggregates
  * with no windows at all.
  *
  * Reference context: g12 extends the reference's spatial-index lineage
  * (SURVEY §2 G4 rtree→layout) with the string-prefix face; a52 has no
  * counterpart (a-family monitoring).
  */
object Extended105 {
  type Q = (SparkSession, String) => DataFrame

  private val Alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** gh6 as a SQL expr over a 30-bit Morton column `z`: six base-32
    * substring lookups — pos/len substring accepts expressions, so the
    * whole decode stays inside whole-stage codegen (no UDF).
    */
  private def gh6Expr: String =
    (0 until 6).map { k =>
      s"substring('$Alpha', CAST((z >> ${25 - 5 * k}) & 31 AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")")

  val queries: Map[String, Q] = Map(
    // ---- g12: geohash cells with parent rollup ----
    "g12_geohash_cells" -> ((s, d) => {
      val q = t(s, d, "events").select(
        // integer quantization: (scaled·2^15) div span — no float seam
        expr("(pmod(user_id, 180) * 32768) div 180").as("qlat"),
        expr("(pmod(cast(round(value * 100) as long), 36000) * 32768) div 36000")
          .as("qlon"))
      val z = ZOrder.interleave(col("qlat"), col("qlon"), 15)
      q.select(z.as("z"))
        .withColumn("gh6", expr(gh6Expr))
        .groupBy("gh6").agg(count(lit(1)).as("n"))
        .withColumn("gh3", substring(col("gh6"), 1, 3))
        .select("gh6", "gh3", "n")
        .orderBy(col("n").desc, col("gh6")).limit(20)
    }),

    // ---- a52: Grubbs' outlier test per event type ----
    "a52_grubbs" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val stats = dy.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      val withDev = dy.join(stats, "event_type")
        // |n·y − Σy|: the integer deviation that decides the argmax
        .withColumn("dev", abs(dec(col("n")) * dec(col("y")) - col("sy")))
      val maxDev = withDev.groupBy("event_type").agg(max("dev").as("maxdev"))
      val flagged = withDev.join(maxDev, "event_type")
        .filter(col("dev") === col("maxdev"))
        .groupBy("event_type").agg(min("day").as("day_flagged"),
          first("n").as("n"), first("sy").as("sy"), first("syy").as("syy"),
          first("maxdev").as("maxdev"))
      flagged.select(col("event_type"), col("n"), col("day_flagged"),
          round(col("maxdev").cast("double") /
            (col("n").cast("double") *
              sqrt((dec(col("n")) * col("syy") - col("sy") * col("sy"))
                .cast("double") /
                (col("n") * (col("n") - 1)).cast("double"))), 6).as("g_stat"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g12_geohash_cells" -> {
      val z = ZOrder.sqlExpr("qlat", "qlon", 15)
      val gh = (0 until 6).map { k =>
        s"substring('$Alpha', CAST((z >> ${25 - 5 * k}) & 31 AS INT) + 1, 1)"
      }.mkString("concat(", ", ", ")")
      s"""WITH q AS (
           SELECT (user_id % 180) * 32768 // 180 AS qlat,
             (CAST(round(value * 100) AS BIGINT) % 36000) * 32768 // 36000
               AS qlon
           FROM events),
         coded AS (SELECT $z AS z FROM q),
         cells AS (
           SELECT $gh AS gh6, CAST(count(*) AS BIGINT) AS n
           FROM coded GROUP BY 1)
         SELECT gh6, substring(gh6, 1, 3) AS gh3, n
         FROM cells ORDER BY n DESC, gh6 LIMIT 20"""
    },
    "a52_grubbs" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM dy GROUP BY event_type),
         dev AS (
           SELECT d.event_type, d.day, s.n, s.sy, s.syy,
             abs(s.n * CAST(d.y AS HUGEINT) - s.sy) AS dev
           FROM dy d JOIN stats s ON d.event_type = s.event_type),
         mx AS (
           SELECT event_type, max(dev) AS maxdev FROM dev GROUP BY event_type),
         flagged AS (
           SELECT dev.event_type, min(day) AS day_flagged,
             max(dev.n) AS n, max(dev.sy) AS sy, max(dev.syy) AS syy,
             max(mx.maxdev) AS maxdev
           FROM dev JOIN mx ON dev.event_type = mx.event_type
             AND dev.dev = mx.maxdev
           GROUP BY dev.event_type)
         SELECT event_type, n, day_flagged,
           round(CAST(maxdev AS DOUBLE)
             / (CAST(n AS DOUBLE)
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE))), 6) AS g_stat
         FROM flagged ORDER BY event_type"""
  )
}
