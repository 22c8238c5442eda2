package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-113: real-decode frame differencing and the Friedman test,
  * pinned to generation-stream / textbook replays.
  */
class Extended113Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("mm9 SAD matches the splitmix generation streams; static shots are zero") {
    val got = graft.queries.Extended113.queries("mm9_frame_diff")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))

    def pix(seed: Long, i: Int): Long =
      java.lang.Math.floorMod(
        graft.functions.Hashing.splitmix64(seed * 1000003L + i), 256L)
    got.foreach { case (id, w, h, sad, mad, change) =>
      assert(w == 3 + (id % 6).toInt && h == 3 + ((id / 6) % 6).toInt)
      val seedB = if (id % 5 == 0) id else id + 252L
      val n = w * h * 3
      val want = (0 until n).map(i => math.abs(pix(id, i) - pix(seedB, i))).sum
      assert(sad == want, s"doc $id sad")
      assert(math.abs(mad - sad.toDouble / n) < 1e-4, s"doc $id mad")
      assert(change == (sad > 64L * n), s"doc $id verdict")
      if (id % 5 == 0) assert(sad == 0L, s"static shot $id must be exact zero")
    }
    // both classes must appear, and every non-static frame pair differs
    assert(got.exists(_._6) && got.exists(g => !g._6))
    assert(got.filter(g => g._1 % 5 != 0).forall(_._4 > 0L))
  }

  test("a59 chi2 matches a local tie-corrected Friedman computation") {
    val row = graft.queries.Extended113.queries("a59_friedman_test")(spark, d)
      .collect().head
    val cells = Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, day), rs) =>
        (ty, day, rs.map(_._3).sum) }.toSeq
    val k = cells.map(_._1).distinct.size
    val byDay = cells.groupBy(_._2).filter(_._2.size == k)
    val n = byDay.size
    // midranks within each complete day-block
    val ranked = byDay.values.flatMap { block =>
      val sorted = block.map(_._3).sorted
      block.map { case (ty, _, y) =>
        val below = sorted.count(_ < y)
        val ties = sorted.count(_ == y)
        (ty, below + (ties + 1) / 2.0)
      }
    }.toSeq
    val rj = ranked.groupBy(_._1).map { case (ty, rs) => ty -> rs.map(_._2).sum }
    val a = ranked.map(r => r._2 * r._2).sum
    val c = n.toDouble * k * (k + 1) * (k + 1) / 4.0
    val num = (k - 1) * rj.values.map(r => math.pow(r - n * (k + 1) / 2.0, 2)).sum
    val want = num / (a - c)
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-5,
      s"chi2 ${row.getDouble(2)} vs $want")
    assert(row.getDouble(2) >= 0.0)
  }
}
