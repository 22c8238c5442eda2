package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-81: length-bucket batch planning + image tile pooling, pinned to
  * local brute force (the tile sums against the generation stream, the
  * batching plan against a collected recount).
  */
class Extended81Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp33 buckets are powers of two covering every doc; plan arithmetic is exact") {
    val got = graft.queries.Extended81.queries("tp33_length_bucket_batches")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toList

    // local model
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
    def pad(nw: Long): Long =
      if (nw <= 1) 1L else java.lang.Long.highestOneBit(nw - 1) << 1
    val want = docs.groupBy { case (l, nw) => (l, pad(nw)) }.toSeq
      .map { case ((l, p), xs) =>
        val nDocs = xs.length.toLong
        val sumTok = xs.map(_._2).sum
        val per = math.max(4096L / p, 1L)
        (l, p, nDocs, sumTok, per, (nDocs + per - 1) / per, nDocs * p - sumTok)
      }.sortBy(t => (t._1, t._2))
    assert(got == want)
    got.foreach { case (_, padded, _, _, _, _, waste) =>
      assert(java.lang.Long.bitCount(padded) == 1, s"padded=$padded not a power of two")
      assert(waste >= 0)
    }
  }

  test("mm7 tile sums equal the generation stream recomputed locally") {
    val got = graft.queries.Extended81.queries("mm7_image_tiles")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        Array(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)),
        r.getInt(7)))
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, tiles, brightest) =>
      assert(w == 3 + java.lang.Math.floorMod(id, 6L).toInt)
      assert(h == 3 + java.lang.Math.floorMod(id / 6, 6L).toInt)
      val want = new Array[Long](4)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (y * w + x) * 3
        val g = (0 until 3).map(c =>
          java.lang.Math.floorMod(
            graft.functions.Hashing.splitmix64(id * 1000003L + base + c),
            256L)).sum
        want((if (2 * y >= h) 2 else 0) + (if (2 * x >= w) 1 else 0)) += g
      }
      assert(tiles.toSeq == want.toSeq, s"id=$id tiles")
      assert(brightest == want.indices.maxBy(i => (want(i), -i)), s"id=$id argmax")
    }
  }
}
