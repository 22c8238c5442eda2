package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-94: change-point detection, quality gate, stickiness — each
  * pinned to a local definitional replay over collected rows.
  */
class Extended94Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a45 change point matches the local binary-segmentation argmin") {
    val got = graft.queries.Extended94.queries("a45_changepoint")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((ty, day), rows) => (ty, day, rows.map(_._3).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (ty, rows) =>
      val ys = rows.sortBy(_._2).map(r => (r._2, r._3))
      val n = ys.size.toLong
      val st = ys.map(_._2).sum
      val qt = ys.map(y => y._2 * y._2).sum
      var bestCost = Double.MaxValue
      var bestTau = Long.MaxValue
      var nl = 0L; var sl = 0L
      ys.dropRight(1).foreach { case (day, y) =>
        nl += 1; sl += y
        val cost = qt.toDouble - (sl * sl).toDouble / nl.toDouble -
          ((st - sl) * (st - sl)).toDouble / (n - nl).toDouble
        if (cost < bestCost) { bestCost = cost; bestTau = day }
      }
      assert(got(ty)._1 == bestTau, s"$ty tau")
      assert(got(ty)._2 == r4(bestCost), s"$ty cost")
    }
  }

  test("tp36 gate flags match local rule evaluation and keep is their conjunction") {
    val got = graft.queries.Extended94.queries("tp36_quality_gate")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 2)
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      val words = text.split(" ", -1)
      val nw = words.length.toLong
      val nc = words.map(_.length.toLong).sum
      val maxw = words.groupBy(identity).map(_._2.length).max.toLong
      val grams = words.sliding(2).map(_.mkString(" ")).toSeq
      val n2 = grams.size.toLong
      val d2 = grams.distinct.size.toLong
      val exp = (nw >= 20 && nw <= 1000, nc >= 2 * nw && nc <= 12 * nw,
        5 * maxw < nw, 10 * (n2 - d2) < 3 * n2)
      val g = got(id)
      assert((g._1, g._2, g._3, g._4) == exp, s"doc $id flags")
      assert(g._5 == (exp._1 && exp._2 && exp._3 && exp._4), s"doc $id keep")
    }
    // the gate must discriminate on the synthetic corpus
    assert(got.values.exists(_._5) && got.values.exists(!_._5),
      "gate passed or failed every document — thresholds are a no-op")
  }

  test("e35 stickiness matches a local trailing-window replay") {
    val got = graft.queries.Extended94.queries("e35_stickiness")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val acts = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = acts.map(_._2).distinct.sorted
    assert(got.keySet == days.toSet)
    days.foreach { day =>
      val dau = acts.count(_._2 == day).toLong
      val wau = acts.filter(a => a._2 <= day && a._2 >= day - 6)
        .map(_._1).distinct.size.toLong
      assert(got(day)._1 == dau, s"day $day dau")
      assert(got(day)._2 == wau, s"day $day wau")
      assert(got(day)._3 == r6(dau.toDouble / wau.toDouble), s"day $day ratio")
      assert(wau >= dau)
    }
  }
}
