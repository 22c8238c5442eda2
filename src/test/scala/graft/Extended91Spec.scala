package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-91: token-budget trim + month-over-month growth, pinned to local
  * brute force.
  */
class Extended91Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp34 kept set equals the greedy budget walk per source") {
    val got = graft.queries.Extended91.queries("tp34_token_budget_trim")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        graft.llm.Text.tokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val bySource = docs.groupBy(_._2)
    assert(got.map(_._1) == got.map(_._1).sorted && got.nonEmpty)
    got.foreach { case (src, nDocs, nKept, tokTot, tokKept, util) =>
      val rows = bySource(src).sortBy(r => (-r._3, r._1))
      assert(nDocs == rows.length.toLong)
      assert(tokTot == rows.map(_._4).sum)
      var cum = 0L; var k = 0L; var kt = 0L
      rows.foreach { r =>
        cum += r._4
        if (cum <= 50000L) { k += 1; kt += r._4 }
      }
      assert(nKept == k && tokKept == kt, s"src=$src")
      assert(util == BigDecimal(kt.toDouble / 50000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q25 growth equals the recomputed monthly lag ratio") {
    val got = graft.queries.Extended91.queries("q25_mom_growth")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toList
    assert(got.nonEmpty)
    val monthly = graft.Tables.t(spark, d, "lineitem")
      .select((col("l_partkey") % 10).as("brand"),
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("c"))
      .groupBy("brand", "m").agg(sum("c").as("c"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    got.foreach { case (brand, month, rev, prev, growth) =>
      assert(monthly((brand, month)) == rev)
      // prev must be the chronologically previous month present for brand
      val months = monthly.keys.filter(_._1 == brand).map(_._2).toSeq.sorted
      val idx = months.indexOf(month)
      assert(idx > 0 && monthly((brand, months(idx - 1))) == prev, s"$brand $month")
      assert(growth == BigDecimal((rev - prev).toDouble / prev)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // every brand-month pair except each brand's first must appear
    val expected = monthly.keys.groupBy(_._1).values.map(_.size - 1).sum
    assert(got.size == expected)
  }
}
