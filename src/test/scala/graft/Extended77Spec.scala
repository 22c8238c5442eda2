package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-77: robust trend analysis (Theil–Sen, Mann–Kendall) — pinned to
  * a local brute force over the collected hourly series.
  */
class Extended77Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  // (event_type, h, x) hourly count series, the same derivation as the query
  private lazy val hourly: Map[String, Seq[(Long, Long)]] =
    graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(r => (r._2, r._3)).sortBy(_._1).toSeq }

  test("a35 Theil–Sen slope equals the brute-force lower median of pairwise slopes") {
    val got = graft.queries.Extended77.queries("a35_theil_sen")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (et, nPairs, slope) =>
      val series = hourly(et)
      val slopes = for {
        i <- series.indices; j <- (i + 1) until series.size
      } yield (series(j)._2 - series(i)._2).toDouble / (series(j)._1 - series(i)._1)
      assert(nPairs == slopes.size.toLong, s"type=$et")
      val sorted = slopes.sorted
      val want = sorted((sorted.size + 1) / 2 - 1) // lower median, 1-based rank (m+1)/2
      val wantR = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(slope == wantR, s"type=$et got=$slope want=$wantR")
    }
  }

  test("a36 Mann–Kendall S, tie-corrected variance and z match brute force") {
    val got = graft.queries.Extended77.queries("a36_mann_kendall")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toList
    assert(got.nonEmpty)
    got.foreach { case (et, n, s0, var18, z) =>
      val series = hourly(et)
      assert(n == series.size.toLong, s"type=$et")
      val wantS = (for {
        i <- series.indices; j <- (i + 1) until series.size
      } yield java.lang.Long.signum(series(j)._2 - series(i)._2).toLong).sum
      assert(s0 == wantS, s"type=$et")
      val tie = series.groupBy(_._2).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val wantVar18 = n * (n - 1) * (2 * n + 5) - tie
      assert(var18 == wantVar18, s"type=$et")
      val wantZ =
        if (wantVar18 <= 0 || wantS == 0) 0.0
        else (wantS.toDouble - math.signum(wantS.toDouble)) /
          math.sqrt(wantVar18.toDouble / 18.0)
      assert(math.abs(z - wantZ) < 1e-6, s"type=$et got=$z want=$wantZ")
    }
  }
}
