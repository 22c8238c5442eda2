package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-88: IVF probe curve + centroid balance, pinned to the index's
  * own invariants and a local membership replay.
  */
class Extended88Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("v11 curve is monotone in n_probe and recall hits 1.0 by full probe of brute cells") {
    val got = graft.queries.Extended88.queries("v11_ivf_probe_curve")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got.map(_._1) == List(1L, 2L, 4L, 8L))
    // scanned and hits are non-decreasing in probe depth; recall = hits/10
    got.sliding(2).foreach { case List(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3)
    }
    got.foreach { case (_, scanned, hits, recall) =>
      assert(hits <= 10 && hits >= 0 && scanned >= hits)
      assert(recall == BigDecimal(hits.toDouble / 10.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // a trained 16-cell index must reach high recall by 8 probes
    assert(got.last._4 >= 0.9, s"recall@8 probes = ${got.last._4}")
  }

  test("v12 shares sum to 1; imbalance = max*cells/total; population conserved") {
    val got = graft.queries.Extended88.queries("v12_centroid_balance")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toList
    val nVecs = graft.Tables.t(spark, d, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(got.map(_._2).sum == nVecs)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
    val want = BigDecimal(
      got.map(_._2).max.toDouble * got.size / nVecs.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (_, _, _, imb) => assert(imb == want) }
    assert(got.map(_._1) == got.map(_._1).sorted)
  }
}
