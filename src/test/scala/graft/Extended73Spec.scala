package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-73: binary-sign Hamming retrieval. */
class Extended73Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("v9 equals the local sign-bit Hamming top-10") {
    val got = graft.queries.Extended73
      .queries("v9_binary_hamming_topk")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList

    val vecs = Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def code(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0) lo |= 1L << i
      for (i <- 0 until 32) if (v(32 + i) > 0) hi |= 1L << i
      (lo, hi)
    }
    val (qlo, qhi) = code(vecs.find(_._1 == 0L).get._2)
    val want = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val (lo, hi) = code(v)
      (id, java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi))
    }.sortBy(t => (t._2, t._1)).take(10).toList
    assert(got == want)
    // binary codes really compress: distances land well below 64
    assert(got.head._2 < 32)
  }
}
