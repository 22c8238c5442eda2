package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-72: exact lag-k autocorrelation. */
class Extended72Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a34 matches a local Pearson over aligned hourly pairs") {
    val got = graft.queries.Extended72.queries("a34_acf")(spark, d)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)

    val hourly = Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val types = hourly.keys.map(_._1).toList.distinct
    for (t0 <- types; k <- 1 to 3) {
      val series = hourly.collect { case ((tt, h), x) if tt == t0 => (h, x) }
      val pairs = series.toList.flatMap { case (h, x) =>
        series.toMap.get(h + k).map(y => (x, y))
      }
      got.get((t0, k)) match {
        case None => assert(pairs.isEmpty, s"$t0 k=$k missing")
        case Some((n, acf)) =>
          assert(n == pairs.length.toLong, s"$t0 k=$k n")
          val m = pairs.length.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val want = (m * sxy - sx * sy).toDouble /
            math.sqrt(((m * sxx - sx * sx) * (m * syy - sy * sy)).toDouble)
          assert(math.abs(acf - want) < 1e-12, s"$t0 k=$k")
          assert(acf >= -1.0 - 1e-12 && acf <= 1.0 + 1e-12)
      }
    }
  }
}
