package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-87: language confusion matrix + resize roundtrip, pinned to a
  * recount and the floor-sampling generation-stream model.
  */
class Extended87Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("t28 cells partition the corpus; diagonal share is the class recall") {
    val got = graft.queries.Extended87.queries("t28_lang_confusion")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    val total = graft.Tables.t(spark, d, "documents").count()
    assert(got.map(_._3).sum == total)
    // shares sum to 1 within each true class
    got.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    }
    // independent recount of one cell via the engine's own langId column
    val (lang, pred, n, _) = got.head
    val cell = graft.Tables.t(spark, d, "documents")
      .select(col("lang"), graft.llm.Text.langId(col("text")).as("p"))
      .filter(col("lang") === lang && col("p") === pred).count()
    assert(cell == n)
  }

  test("mm8 resized tile sums equal the floor-sampled generation stream") {
    val got = graft.queries.Extended87.queries("mm8_resize_stats")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        Array(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)),
        r.getInt(7)))
    assert(got.nonEmpty)
    got.foreach { case (id, w4, h4, tiles, brightest) =>
      assert(w4 == 4 && h4 == 4)
      val w = 3 + java.lang.Math.floorMod(id, 6L).toInt
      val h = 3 + java.lang.Math.floorMod(id / 6, 6L).toInt
      val want = new Array[Long](4)
      for (y <- 0 until 4; x <- 0 until 4) {
        val sx = x * w / 4
        val sy = y * h / 4
        val base = (sy * w + sx) * 3
        val g = (0 until 3).map(c =>
          java.lang.Math.floorMod(
            graft.functions.Hashing.splitmix64(id * 1000003L + base + c),
            256L)).sum
        want((if (y >= 2) 2 else 0) + (if (x >= 2) 1 else 0)) += g
      }
      assert(tiles.toSeq == want.toSeq, s"id=$id tiles")
      assert(brightest == want.indices.maxBy(i => (want(i), -i)), s"id=$id argmax")
    }
  }
}
