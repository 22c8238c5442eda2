package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-105: geohash cells + Grubbs test, pinned to local replays. */
class Extended105Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private val Alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def geohash6(userId: Long, cents: Long): String = {
    val qlat = ((userId % 180) * 32768) / 180
    val qlon = ((cents % 36000) * 32768) / 36000
    var z = 0L
    for (i <- 0 until 15) {
      z |= ((qlat >> i) & 1) << (2 * i)
      z |= ((qlon >> i) & 1) << (2 * i + 1)
    }
    (0 until 6).map(k => Alpha(((z >> (25 - 5 * k)) & 31).toInt)).mkString
  }

  test("g12 top cells match a local geohash walk and prefixes nest") {
    val got = graft.queries.Extended105.queries("g12_geohash_cells")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), round(col("value") * 100).cast("long"))
      .collect().map(r => geohash6(r.getLong(0), r.getLong(1)))
    val counts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expect = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(20)
    assert(got.map(g => (g._1, g._3)).toSeq == expect)
    // parent prefix is literally the first 3 chars — hierarchy by prefix
    assert(got.forall { case (g6, g3, _) => g6.startsWith(g3) && g3.length == 3 })
  }

  test("a52 Grubbs statistic and flagged day match a local scan") {
    val got = graft.queries.Extended105.queries("a52_grubbs")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.groupBy(_._2).map { case (dy, rs) => (dy, rs.map(_._3).sum) }.toSeq
      }
    daily.foreach { case (ty, ys) =>
      val n = ys.length.toLong
      val sy = ys.map(t => BigInt(t._2)).sum
      val syy = ys.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val devs = ys.map { case (dy, y) => (dy, (BigInt(n) * BigInt(y) - sy).abs) }
      val maxdev = devs.map(_._2).max
      val dayFlagged = devs.filter(_._2 == maxdev).map(_._1).min
      val sVar = (BigInt(n) * syy - sy * sy).toDouble / (n * (n - 1)).toDouble
      val g = maxdev.toDouble / (n.toDouble * math.sqrt(sVar))
      assert(got(ty)._1 == n, s"$ty n")
      assert(got(ty)._2 == dayFlagged, s"$ty day")
      assert(math.abs(got(ty)._3 - g) < 1e-5, s"$ty G")
      // G is bounded by (n−1)/√n — the Grubbs identity
      assert(got(ty)._3 <= (n - 1).toDouble / math.sqrt(n.toDouble) + 1e-9)
    }
    assert(got.size == 5)
  }
}
