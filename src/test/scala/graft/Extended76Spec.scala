package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-76: classifier threshold sweep. */
class Extended76Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp29 confusion counts partition the corpus and metrics are consistent") {
    val got = graft.queries.Extended76.queries("tp29_threshold_sweep")(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toList
    assert(got.map(_._1) == got.map(_._1).sorted && got.size == 5)

    val scored = graft.queries.Extended62.classifierScores(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val n = scored.length.toLong
    got.foreach { case (t, tp, fp, fn, tn, p, r, f1) =>
      assert(tp + fp + fn + tn == n, s"t=$t")
      val wantTp = scored.count { case (s0, y) => s0 >= t && y == 1L }.toLong
      val wantFp = scored.count { case (s0, y) => s0 >= t && y == 0L }.toLong
      val wantFn = scored.count { case (s0, y) => s0 < t && y == 1L }.toLong
      assert((tp, fp, fn) == (wantTp, wantFp, wantFn), s"t=$t")
      assert(p == tp.toDouble / (tp + fp) && r == tp.toDouble / (tp + fn))
      assert(f1 == 2.0 * tp / (2.0 * tp + fp + fn))
    }
    // recall is monotone non-increasing as the threshold rises
    val recalls = got.map(_._7)
    assert(recalls == recalls.sorted.reverse)
  }
}
