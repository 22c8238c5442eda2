package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-114: Holt–Winters seasonal smoothing and the Brown–Forsythe
  * test, pinned to local recurrence/textbook replays.
  */
class Extended114Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("e40 level/trend/forecast match the local Holt-Winters recurrence") {
    val got = graft.queries.Extended114.queries("e40_holt_winters")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val hourly = Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, h), rs) =>
        (ty, h, rs.size.toLong) }
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.toSeq.sortBy(_._2).map(_._3) }
    hourly.filter(_._2.length > 24).foreach { case (ty, xs) =>
      val l0 = xs.take(24).map(_.toDouble).sum / 24.0
      var s = xs.take(24).map(_.toDouble - l0).toArray
      var l = l0; var b = 0.0; var i = 0
      xs.drop(24).foreach { x =>
        val idx = i % 24
        val l2 = 0.25 * (x - s(idx)) + 0.75 * (l + b)
        val b2 = 0.5 * (l2 - l) + 0.5 * b
        s(idx) = 0.25 * (x - l2) + 0.75 * s(idx)
        l = l2; b = b2; i += 1
      }
      val fc = l + b + s(i % 24)
      val g = got(ty)
      assert(g._1 == xs.length.toLong, s"$ty n_obs")
      assert(math.abs(g._2 - l) < 1e-5, s"$ty level")
      assert(math.abs(g._3 - b) < 1e-5, s"$ty trend")
      assert(math.abs(g._4 - fc) < 1e-5, s"$ty forecast")
    }
    assert(got.size == hourly.count(_._2.length > 24))
    assert(got.nonEmpty)
  }

  test("a60 F matches a local textbook Brown-Forsythe computation") {
    val row = graft.queries.Extended114.queries("a60_brown_forsythe")(spark, d)
      .collect().head
    val xs = Tables.t(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).map { case (ty, rs) => ty -> rs.map(_._2) }
    // lower weighted median: min v with 2·cum >= total
    def lowerMedian(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      sorted((vs.length - 1) / 2)
    }
    val z = groups.map { case (ty, vs) =>
      val m = lowerMedian(vs.toSeq)
      ty -> vs.map(v => math.abs(v - m).toDouble)
    }
    val k = z.size
    val n = z.values.map(_.size).sum
    val zbar = z.values.flatten.sum / n
    val between = z.values.map { g =>
      val gm = g.sum / g.size
      g.size * (gm - zbar) * (gm - zbar)
    }.sum
    val within = z.values.map { g =>
      val gm = g.sum / g.size
      g.map(v => (v - gm) * (v - gm)).sum
    }.sum
    val want = (n - k).toDouble / (k - 1).toDouble * between / within
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-4,
      s"F ${row.getDouble(2)} vs $want")
    assert(row.getDouble(2) >= 0.0)
  }
}
