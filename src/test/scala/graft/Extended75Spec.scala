package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-75: Holt double-exponential smoothing. */
class Extended75Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("e30 equals the local Holt recurrence over the hour-ordered series") {
    val got = graft.queries.Extended75.queries("e30_holt_forecast")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)

    val hourly = Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (t0, nObs, level, trend, forecast) =>
      val xs = hourly.collect { case ((tt, h), x) if tt == t0 => (h, x) }
        .toList.sortBy(_._1).map(_._2)
      assert(nObs == xs.length.toLong, t0)
      var l = xs.head.toDouble; var b = 0.0
      xs.tail.foreach { x =>
        val l2 = 0.25 * x + 0.75 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l = l2
      }
      assert(level == l && trend == b, t0)
      assert(forecast == l + b, t0)
    }
  }
}
