package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Batch-70: perceptual-hash image dedup over real decodes. */
class Extended70Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("seeded synthesis yields byte-identical PNGs for equal seeds") {
    import spark.implicits._
    val df = Seq((10L, 5L), (11L, 5L), (12L, 6L)).toDF("id", "seed")
    val got = Multimodal.synthesizeImagesSeeded(df, "id", col("seed"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
      .toMap
    assert(got(10L) == got(11L))
    assert(got(10L) != got(12L))
  }

  test("imageAHash equals a local restatement of the generation stream") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("id")
    val media = Multimodal.synthesizeImagesSeeded(ids, "id", col("id"))
    val got = Multimodal.imageAHash(media)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
        r.getString(3), r.getInt(4)))).toMap

    for (id <- 0L until 40L) {
      val w = Multimodal.synthWidth(id); val h = Multimodal.synthHeight(id)
      val n = w * h
      val gray = (0 until n).map { p =>
        (0 until 3).map(c => Multimodal.synthPixel(id, p * 3 + c).toLong).sum
      }
      val total = gray.sum
      val hash = gray.map(g => if (g * n > total) '1' else '0').mkString
      assert(got(id) == (w, h, hash, hash.count(_ == '1')), s"id $id")
    }
  }

  test("mm5 groups every planted pair and only hash-identical images") {
    val got = graft.queries.Extended70.queries("mm5_image_ahash_dedup")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    val nDocs = Tables.t(spark, d, "documents").count()
    // every consecutive pair (2k, 2k+1) shares a seed → at least ~half the
    // corpus sits in groups; and group members count never exceeds corpus
    assert(got.map(_._4).sum >= nDocs / 2)
    got.foreach { case (w, h, hash, n, lo, hi) =>
      assert(hash.length == w * h && n >= 2 && lo < hi)
    }
    // planted pairs land together: doc 0 and 1 share a group
    val g01 = got.find(g => g._5 == 0L)
    assert(g01.isDefined && g01.get._6 >= 1L)
  }
}
