package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Batch-74: span-corruption masking. */
class Extended74Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp28 matches the local stateless span-mask model") {
    val got = graft.queries.Extended74.queries("tp28_span_corruption")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toList

    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), split(col("text"), " "))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).length))
    val want = docs.map { case (id, n) =>
      def starts(p: Int) = Hashing.splitmix64(id * 31L + p) % 16L == 0L
      val spans = (0 until n).count(starts)
      val masked = (0 until n).count { p =>
        starts(p) || (p >= 1 && starts(p - 1)) || (p >= 2 && starts(p - 2))
      }
      (id, n.toLong, spans.toLong, masked.toLong,
        masked.toDouble / n.toDouble)
    }.sortBy(_._1).toList
    assert(got == want)
    // mask rate lands in the T5 ballpark corpus-wide
    val frac = got.map(_._4).sum.toDouble / got.map(_._2).sum.toDouble
    assert(frac > 0.10 && frac < 0.25, s"corpus mask rate $frac")
  }
}
