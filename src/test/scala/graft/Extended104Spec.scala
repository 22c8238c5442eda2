package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-104: Jensen–Shannon + Durbin–Watson, pinned to local replays. */
class Extended104Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a50 per-type JS contributions match a local fold and sum within ln 2") {
    val got = graft.queries.Extended104.queries("a50_jensen_shannon")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    val ev = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), dayofweek(col("ts")).isin(1, 7).as("we"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val byType = ev.groupBy(_._1)
    val nwd = ev.count(!_._2).toLong
    val nwe = ev.count(_._2).toLong
    var total = 0.0
    byType.foreach { case (ty, rows) =>
      val cwd = rows.count(!_._2).toLong
      val cwe = rows.count(_._2).toLong
      val p = cwd.toDouble / nwd
      val q = cwe.toDouble / nwe
      val m = (p + q) / 2.0
      val contrib = (if (p > 0) p * math.log(p / m) / 2.0 else 0.0) +
        (if (q > 0) q * math.log(q / m) / 2.0 else 0.0)
      assert(got(ty)._1 == cwd && got(ty)._2 == cwe, s"$ty counts")
      assert(math.abs(got(ty)._3 - contrib) < 1e-8, s"$ty contrib")
      total += contrib
    }
    // JSD is bounded by ln 2 and non-negative
    assert(total >= -1e-12 && total <= math.log(2.0) + 1e-12)
  }

  test("a51 DW matches a local exact-OLS residual walk") {
    val got = graft.queries.Extended104.queries("a51_durbin_watson")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.groupBy(_._2).map { case (dy, rs) => (dy, rs.map(_._3).sum) }
          .toSeq.sortBy(_._1).map(_._2)
      }
    daily.foreach { case (ty, ys) =>
      val n = ys.length.toLong
      val ts = (1L to n).toSeq
      val (st, sy) = (ts.sum, ys.sum)
      val stt = ts.map(t => t * t).sum
      val sty = ts.zip(ys).map { case (t, y) => BigInt(t) * BigInt(y) }.sum
      val beta = (BigInt(n) * sty - BigInt(st) * BigInt(sy)).toDouble /
        (BigInt(n) * BigInt(stt) - BigInt(st) * BigInt(st)).toDouble
      val alpha = (sy.toDouble - beta * st.toDouble) / n
      val es = ts.zip(ys).map { case (t, y) => y.toDouble - alpha - beta * t }
      val see = es.map(e => e * e).sum
      val sdd = es.zip(es.tail).map { case (a, b) => (b - a) * (b - a) }.sum
      assert(got(ty)._1 == n, s"$ty n_days")
      assert(math.abs(got(ty)._2 - sdd / see) < 1e-5, s"$ty dw")
      // a fitted trend must leave DW in the meaningful band
      assert(got(ty)._2 > 0.0 && got(ty)._2 < 4.0, s"$ty dw range")
    }
    assert(got.size == 5)
  }
}
