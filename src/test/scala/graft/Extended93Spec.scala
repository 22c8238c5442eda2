package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-93: repetition quality signals, cohort retention, Kendall τ-b —
  * each pinned to a local definitional replay over collected rows.
  */
class Extended93Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tp35 repetition signals match a per-doc local gram count") {
    val rows = graft.queries.Extended93
      .queries("tp35_repetition_signals")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty && rows.size == docs.count(_._2.split(" ").length >= 2))
    docs.foreach { case (id, text) =>
      val words = text.split(" ", -1)
      if (words.length >= 2) {
        val grams = words.sliding(2).map(_.mkString(" ")).toSeq
        val (n2, d2, rep, share) = rows(id)
        assert(n2 == grams.size.toLong, s"doc $id n2")
        assert(d2 == grams.distinct.size.toLong, s"doc $id d2")
        assert(rep == r6((grams.size - grams.distinct.size).toDouble / grams.size),
          s"doc $id rep")
        val wc = words.groupBy(identity).map(_._2.length)
        assert(share == r6(wc.max.toDouble / words.length), s"doc $id share")
      }
    }
    // the synthetic corpus must actually exercise the signal
    assert(rows.values.exists(_._3 > 0), "no doc with any repeated 2-gram")
  }

  test("e34 cohort retention matches a local first-week replay") {
    val got = graft.queries.Extended93
      .queries("e34_cohort_retention")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val acts = graft.Tables.t(spark, d, "events")
      .filter(col("event_type") === "purchase" && col("value") > 15)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = acts.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val cells = acts.map { case (u, w) => (cohort(u), w - cohort(u)) }
      .filter(_._2 <= 3)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == cells.keySet)
    cells.foreach { case ((cw, k), n) =>
      assert(got((cw, k))._1 == n, s"cell ($cw, $k)")
      assert(got((cw, k))._2 == r6(n.toDouble / cells((cw, 0L))), s"ratio ($cw, $k)")
    }
    // week-0 cells are 1.0 by construction; a later cell must NOT be (the
    // qualifying-action filter exists exactly so the matrix discriminates)
    assert(got.filter(_._1._2 > 0).values.exists(_._2 < 1.0),
      "retention matrix is degenerate (all 1.0)")
  }

  test("a44 Kendall tau-b matches the definitional pair count") {
    val got = graft.queries.Extended93.queries("a44_kendall_tau")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((ty, day), rows) => (ty, day, rows.size.toLong, rows.map(_._3).sum) }
      .toSeq
    daily.groupBy(_._1).foreach { case (ty, rows) =>
      val xs = rows.sortBy(_._2).map(r => (r._3, r._4))
      var s = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.size) {
        s += java.lang.Long.signum(xs(j)._1 - xs(i)._1) *
          java.lang.Long.signum(xs(j)._2 - xs(i)._2)
      }
      val n = xs.size.toLong
      val n0 = n * (n - 1) / 2
      def ties(sel: ((Long, Long)) => Long) =
        xs.groupBy(sel).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      val tau = s.toDouble / math.sqrt(((n0 - ties(_._1)) * (n0 - ties(_._2))).toDouble)
      assert(got(ty)._1 == s, s"$ty S")
      assert(got(ty)._2 == r6(tau), s"$ty tau")
      assert(math.abs(got(ty)._2) <= 1.0)
    }
  }
}
