package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-109: Ljung–Box + Kruskal–Wallis, pinned to local replays. */
class Extended109Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a55 Q matches a local exact-deviation autocorrelation walk") {
    val got = graft.queries.Extended109.queries("a55_ljung_box")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.groupBy(_._2).map { case (dy, rs) => (dy, rs.map(_._3).sum) }
          .toSeq.sortBy(_._1).map(_._2)
      }
    daily.foreach { case (ty, ys) =>
      val n = ys.length
      val s = ys.map(BigInt(_)).sum
      val dv = ys.map(y => BigInt(n) * BigInt(y) - s)
      val c0 = BigInt(n) * (BigInt(n) * ys.map(y => BigInt(y) * BigInt(y)).sum - s * s)
      val rhos = (1 to 7).map { k =>
        val ck = (k until n).map(t => dv(t) * dv(t - k)).sum
        k -> ck.toDouble / c0.toDouble
      }
      val q = n * (n + 2) * rhos.map { case (k, rho) =>
        rho * rho / (n - k)
      }.sum
      assert(got(ty)._1 == n.toLong, s"$ty n")
      assert(math.abs(got(ty)._2 - rhos.head._2) < 1e-5, s"$ty rho1")
      assert(math.abs(got(ty)._3 - q) < 1e-4, s"$ty Q")
      assert(got(ty)._3 >= 0.0, s"$ty Q nonneg")
    }
    assert(got.size == 5)
  }

  test("a56 H matches a local midrank computation and is tie-corrected") {
    val row = graft.queries.Extended109.queries("a56_kruskal_wallis")(spark, d)
      .collect().head
    val xs = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = xs.length
    val sorted = xs.map(_._2).sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
      v -> ps.map(_._2 + 1).sum.toDouble / ps.length
    }
    val groups = xs.groupBy(_._1)
    val srn = groups.toSeq.sortBy(_._1).map { case (_, rows) =>
      val rg = rows.map(r => midrank(r._2)).sum
      rg * rg / rows.length
    }.sum
    val hRaw = 12.0 / (n.toLong * (n + 1)) * srn - 3.0 * (n + 1)
    val ties = xs.groupBy(_._2).values.map(_.length.toLong)
    val tieTerm = ties.map(t => BigInt(t) * t * t - t).sum
    val corr = 1.0 - tieTerm.toDouble /
      (BigInt(n) * n * n - n).toDouble
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("k_groups") == groups.size.toLong)
    assert(math.abs(row.getAs[Double]("h_stat") - hRaw / corr) < 1e-4)
    // H is nonnegative and bounded by n−1 (its algebraic maximum)
    assert(row.getAs[Double]("h_stat") >= 0.0)
    assert(row.getAs[Double]("h_stat") <= (n - 1).toDouble)
  }
}
