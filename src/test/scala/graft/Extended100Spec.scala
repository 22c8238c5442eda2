package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-100: Hurst R/S + Shewhart I-MR, pinned to local replays. */
class Extended100Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def dailySeries(): Map[String, Seq[Long]] =
    graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.groupBy(_._2).map { case (day, rs) => (day, rs.map(_._3).sum) }
          .toSeq.sortBy(_._1).map(_._2)
      }

  test("e38 R/S and Hurst match a local block computation") {
    val got = graft.queries.Extended100.queries("e38_hurst")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def rsBar(ys: Seq[Long], m: Int): Double = {
      val rss = ys.grouped(m).filter(_.length == m).flatMap { blk =>
        val s = blk.sum
        val mz = blk.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (cum, k) => m * cum - (k + 1) * s }
        val q = BigInt(m) * blk.map(y => BigInt(y) * BigInt(y)).sum -
          BigInt(s) * BigInt(s)
        if (q > 0) Some((mz.max - mz.min).toDouble / math.sqrt(q.toDouble))
        else None
      }.toSeq
      rss.sum / rss.length
    }
    dailySeries().foreach { case (ty, ys) =>
      val (rs4, rs8, rs16) = (rsBar(ys, 4), rsBar(ys, 8), rsBar(ys, 16))
      val h = (math.log(rs16) / math.log(2) - math.log(rs4) / math.log(2)) / 2.0
      assert(math.abs(got(ty)._1 - rs4) < 1e-5, s"$ty rs4")
      assert(math.abs(got(ty)._2 - rs8) < 1e-5, s"$ty rs8")
      assert(math.abs(got(ty)._3 - rs16) < 1e-5, s"$ty rs16")
      assert(math.abs(got(ty)._4 - h) < 1e-5, s"$ty hurst")
      // a revenue-volume series should not be strongly mean-reverting
      assert(got(ty)._4 > -0.5 && got(ty)._4 < 1.5, s"$ty hurst sane")
    }
    assert(got.size == 5)
  }

  test("e39 control limits and out-of-control flags match a local chart") {
    val got = graft.queries.Extended100.queries("e39_shewhart")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap
    dailySeries().foreach { case (ty, ys) =>
      val n = ys.length.toLong
      val center = ys.sum.toDouble / n
      val mrs = ys.zip(ys.tail).map { case (a, b) => math.abs(b - a) }
      val mrbar = mrs.map(_.toDouble).sum / mrs.length
      val (ucl, lcl) = (center + 2.66 * mrbar, center - 2.66 * mrbar)
      val nOut = ys.count(y => y.toDouble > ucl || y.toDouble < lcl).toLong
      assert(got(ty)._1 == n, s"$ty n_days")
      assert(math.abs(got(ty)._2 - center) < 1e-3, s"$ty center")
      assert(math.abs(got(ty)._3 - ucl) < 1e-3, s"$ty ucl")
      assert(math.abs(got(ty)._4 - lcl) < 1e-3, s"$ty lcl")
      assert(got(ty)._5 == nOut, s"$ty n_out")
    }
    assert(got.size == 5)
  }
}
