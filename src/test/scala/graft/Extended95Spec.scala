package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-95: ordered funnel, LTV deciles, lexical diversity — each
  * pinned to a local definitional replay over collected rows.
  */
class Extended95Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e36 ordered funnel matches a local per-user sequence replay") {
    val got = graft.queries.Extended95.queries("e36_funnel_conversion")(spark, d)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val ev = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val win = 7L * 86400000000L
    var nV = 0L; var nC = 0L; var nP = 0L
    byUser.foreach { case (_, rows) =>
      val fv = rows.filter(_._2 == "view").map(_._3).minOption
      fv.foreach { v =>
        nV += 1
        val fc = rows.filter(r => r._2 == "click" && r._3 >= v && r._3 <= v + win)
          .map(_._3).minOption
        fc.foreach { c =>
          nC += 1
          if (rows.exists(r =>
            r._2 == "purchase" && r._3 >= c && r._3 <= c + win)) nP += 1
        }
      }
    }
    assert(got(1)._2 == nV && got(2)._2 == nC && got(3)._2 == nP)
    assert(got(1)._3 == 1.0)
    assert(got(2)._3 == r6(nC.toDouble / nV))
    assert(got(3)._3 == r6(nP.toDouble / nC))
    // the funnel must narrow overall for the gate to mean anything (at
    // sf0.001 the click→purchase stage can be lossless — 15 of 15 users
    // who click after a view also purchase — so only monotonicity and
    // end-to-end narrowing are structural)
    assert(nV >= nC && nC >= nP && nP > 0 && nV > nP)
  }

  test("q26 decile boundaries match the local cumulative selection") {
    val got = graft.queries.Extended95.queries("q26_ltv_deciles")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ltv = graft.Tables.t(spark, d, "orders")
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(_.getLong(1)).sorted
    val n = ltv.length.toLong
    (1 to 9).foreach { k =>
      val rank = (k * n + 9) / 10 // ceil(k·n/10), 1-based
      assert(got(s"d$k") == ltv((rank - 1).toInt), s"d$k")
    }
    // boundaries are non-decreasing and strictly span the distribution
    val bs = (1 to 9).map(k => got(s"d$k"))
    assert(bs == bs.sorted && bs.head < bs.last)
  }

  test("t30 lexical diversity matches per-doc local word counts") {
    val got = graft.queries.Extended95.queries("t30_lexical_diversity")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val words = text.split(" ", -1)
      val counts = words.groupBy(identity).map(_._2.length)
      val (nt, ty, ttr, hx) = got(id)
      assert(nt == words.length.toLong && ty == counts.size.toLong, s"doc $id")
      assert(ttr == r6(counts.size.toDouble / words.length), s"doc $id ttr")
      assert(hx == r6(counts.count(_ == 1).toDouble / counts.size), s"doc $id hapax")
    }
  }
}
