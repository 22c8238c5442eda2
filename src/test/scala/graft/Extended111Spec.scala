package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-111: McNemar, Cochran's Q and the Brier decomposition, pinned
  * to local textbook replays.
  */
class Extended111Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  /** Local flags: (word count in [20,1000], top share < 0.2, mean word
    * length in [2,12]) per document.
    */
  private def localFlags: Seq[(Boolean, Boolean, Boolean)] = {
    Tables.t(spark, d, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
      .map { text =>
        val words = text.split(" ", -1).toSeq
        val nw = words.length.toLong
        val maxw = words.groupBy(identity).values.map(_.length).max.toLong
        val nc = words.map(_.length.toLong).sum
        (nw >= 20 && nw <= 1000, 5 * maxw < nw,
          nc >= 2 * nw && nc <= 12 * nw)
      }
  }

  test("a57 chi2 matches the textbook discordant-pair formula") {
    val r = graft.queries.Extended111.queries("a57_mcnemar")(spark, d)
      .collect().head
    val fl = localFlags
    val n11 = fl.count(f => f._1 && f._2).toLong
    val n10 = fl.count(f => f._1 && !f._2).toLong
    val n01 = fl.count(f => !f._1 && f._2).toLong
    val n00 = fl.count(f => !f._1 && !f._2).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n11, n10, n01, n00)))
    val want = if (n10 + n01 == 0) 0.0
      else { val dlt = math.abs(n10 - n01) - 1.0; dlt * dlt / (n10 + n01) }
    assert(math.abs(r.getDouble(4) - want) < 1e-6)
    assert(n11 + n10 + n01 + n00 == fl.size.toLong)
  }

  test("a58 Q matches the textbook k=3 Cochran computation") {
    val r = graft.queries.Extended111.queries("a58_cochran_q")(spark, d)
      .collect().head
    val fl = localFlags
    def b2l(b: Boolean) = if (b) 1L else 0L
    val ta = fl.map(f => b2l(f._1)).sum
    val tb = fl.map(f => b2l(f._2)).sum
    val tc = fl.map(f => b2l(f._3)).sum
    val us = fl.map(f => b2l(f._1) + b2l(f._2) + b2l(f._3))
    val ss = us.sum
    val su2 = us.map(u => u * u).sum
    val k = 3
    // textbook form: Q = k(k−1)·Σ(T_j − S/k)² / (kS − Σu²)
    val sbar = ss.toDouble / k
    val want = k * (k - 1) *
      Seq(ta, tb, tc).map(t => (t - sbar) * (t - sbar)).sum /
      (k * ss - su2).toDouble
    assert(r.getLong(0) == fl.size.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((ta, tb, tc)))
    assert(math.abs(r.getDouble(4) - want) < 1e-5, s"Q ${r.getDouble(4)} vs $want")
    assert(r.getDouble(4) >= 0.0)
  }

  test("tp39 decomposition satisfies REL - RES + UNC = binned Brier") {
    val r = graft.queries.Extended111
      .queries("tp40_brier_decomposition")(spark, d).collect().head
    val (n, rel, res, unc, brier) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    // the identity is exact for binned forecasts
    assert(math.abs(rel - res + unc - brier) < 1e-5)
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25 + 1e-9)
    // direct local Brier over binned forecasts: mean (f_bin − y)²
    val scored = graft.queries.Extended62.classifierScores(spark, d)
      .collect().map(r2 => (r2.getDouble(0), r2.getLong(1)))
    val direct = scored.map { case (score, pos) =>
      val bin = math.min(math.floor((score + 1.0) / 2.0 * 10.0), 9.0).toLong
      val f = (2 * bin + 1).toDouble / 20.0
      val e = f - pos
      e * e
    }.sum / scored.length
    assert(n == scored.length.toLong)
    assert(math.abs(brier - direct) < 1e-5, s"brier $brier vs direct $direct")
  }
}
