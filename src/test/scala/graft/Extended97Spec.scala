package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-97: seasonality strength, gap regularity, ship SLA — each
  * pinned to a local definitional replay.
  */
class Extended97Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a46 eta-squared matches a local variance decomposition") {
    val got = graft.queries.Extended97
      .queries("a46_seasonality_strength")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ev = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("(unix_micros(ts) div 3600000000) % 168").as("how"),
        round(col("value") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (ty, rows) =>
      val n = rows.length.toLong
      val s = rows.map(_._3).sum
      val q = rows.map(r => r._3 * r._3).sum
      val cells = rows.groupBy(_._2).toSeq.sortBy(_._1)
      val between = cells.foldLeft(0.0) { case (acc, (_, cr)) =>
        val cs = cr.map(_._3).sum
        acc + cs.toDouble * cs.toDouble / cr.length.toDouble
      }
      val corr = s.toDouble * s.toDouble / n.toDouble
      val eta = (between - corr) / (q.toDouble - corr)
      assert(got(ty) == r6(eta), s"$ty")
      assert(got(ty) >= 0.0 && got(ty) <= 1.0)
    }
  }

  test("e37 gap regularity matches local per-type lag moments") {
    val got = graft.queries.Extended97.queries("e37_gap_regularity")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val ev = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 60000000").as("mn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (ty, rows) =>
      val ms = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val gaps = ms.zip(ms.tail).map { case (a, b) => b - a }
      val n = gaps.length.toLong
      val sg = gaps.sum
      val sgg = gaps.map(g => g * g).sum
      val mean = sg.toDouble / n
      val cv = math.sqrt((n * sgg - sg * sg).toDouble / (n * (n - 1)).toDouble) / mean
      assert(got(ty)._1 == n, s"$ty n")
      assert(got(ty)._2 == r6(mean), s"$ty mean")
      assert(got(ty)._3 == r6(cv), s"$ty cv")
      assert(got(ty)._3 > 0.0)
    }
  }

  test("q27 SLA shares match local day-exact latency counts") {
    val got = graft.queries.Extended97.queries("q27_ship_sla")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val o = graft.Tables.t(spark, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_timestamp(o_orderdate) div 86400").as("od"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val lats = graft.Tables.t(spark, d, "lineitem")
      .select(col("l_orderkey"), expr("unix_timestamp(l_shipdate) div 86400").as("sd"))
      .collect().map { r =>
        val (pri, od) = o(r.getLong(0)); (pri, r.getLong(1) - od) }
    assert(got.keySet == lats.map(_._1).toSet)
    lats.groupBy(_._1).foreach { case (pri, rows) =>
      val n = rows.length.toLong
      def share(cap: Long) = r6(rows.count(_._2 <= cap).toDouble / n)
      assert(got(pri)._1 == n, s"$pri n")
      assert(got(pri)._2 == share(30) && got(pri)._3 == share(60) &&
        got(pri)._4 == share(90), s"$pri shares")
      // latency caps must actually order: sla30 <= sla60 <= sla90
      assert(got(pri)._2 <= got(pri)._3 && got(pri)._3 <= got(pri)._4)
    }
    // the 30-day gate must discriminate somewhere
    assert(got.values.exists(v => v._2 < v._4))
  }
}
