package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.operators.Selection

/** Property tests for the two-level histogram selection — the kernel
  * behind the whole exact-quantile family (a19/a20/a22/a25/a35/a40/e27).
  * Random (group, value, count) histograms against the definitional
  * brute force (expand → sort → index), across bucket widths, including
  * negative values (floor-division bucketing must stay exact there) and
  * ranks at both extremes.
  */
class SelectionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def forSeeds[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen(Gen.Parameters.default, Seed(0x5E1EC7L + i * 7121L))
        .getOrElse(fail(s"generator failed at seed $i"))
      body(a)
    }

  /** Random histogram: up to 3 groups, values in [-500, 500], counts 1-7. */
  private val histGen: Gen[Seq[(String, Long, Long)]] = for {
    nGroups <- Gen.chooseNum(1, 3)
    rows <- Gen.chooseNum(1, 40)
    entries <- Gen.listOfN(rows, for {
      g <- Gen.chooseNum(0, nGroups - 1)
      v <- Gen.chooseNum(-500L, 500L)
      c <- Gen.chooseNum(1L, 7L)
    } yield (s"g$g", v, c))
  } yield entries.groupBy(e => (e._1, e._2)).toSeq
    .map { case ((g, v), es) => (g, v, es.map(_._3).sum) }

  private def bruteLowerMedian(hist: Seq[(String, Long, Long)]): Map[String, Long] =
    hist.groupBy(_._1).map { case (g, rows) =>
      val expanded = rows.sortBy(_._2).flatMap(r => Seq.fill(r._3.toInt)(r._2))
      g -> expanded((expanded.size + 1) / 2 - 1)
    }

  test("lowerMedian equals the definitional brute force on 40 random histograms") {
    import spark.implicits._
    forSeeds(histGen, 40) { hist =>
      val df = hist.toDF("g", "v", "n")
      for (width <- Seq(1.0, 16.0, 4096.0)) {
        val got = Selection.lowerMedian(df, Seq("g"), "v", "n", "med", width)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == bruteLowerMedian(hist), s"width=$width hist=$hist")
      }
    }
  }

  test("selectRank hits exact min and max ranks on 15 random histograms") {
    import spark.implicits._
    forSeeds(histGen, 15) { hist =>
      val df = hist.toDF("g", "v", "n")
      val mins = Selection.selectRank(df, Seq("g"), "v", "n",
          _ => lit(1L), "out", 16.0)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val maxs = Selection.selectRank(df, Seq("g"), "v", "n",
          tw => tw, "out", 16.0)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      hist.groupBy(_._1).foreach { case (g, rows) =>
        assert(mins(g) == rows.map(_._2).min, s"min g=$g")
        assert(maxs(g) == rows.map(_._2).max, s"max g=$g")
      }
    }
  }

  test("empty-group and single-value histograms behave") {
    import spark.implicits._
    val df = Seq(("a", 7L, 3L)).toDF("g", "v", "n")
    val got = Selection.lowerMedian(df, Seq("g"), "v", "n", "med")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 7L)))
    val empty = Selection.lowerMedian(df.filter(col("n") < 0),
      Seq("g"), "v", "n", "med")
    assert(empty.count() == 0)
  }
}
