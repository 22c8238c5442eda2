package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-102: term burstiness + entropy rate, pinned to local replays. */
class Extended102Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("t31 VMR matches a local zero-inclusive variance computation") {
    val got = graft.queries.Extended102.queries("t31_term_burstiness")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.Tables.t(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val dd = docs.length.toLong
    val perTerm = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) }
    }.groupBy(_._1)
    got.foreach { case (term, (df, s, vmr)) =>
      val counts = perTerm(term).map(_._3)
      assert(df == counts.length.toLong, s"$term df")
      assert(s == counts.sum, s"$term s")
      // zero-inclusive VMR: variance over ALL docs / mean over ALL docs
      val mean = counts.sum.toDouble / dd
      val ex2 = counts.map(c => c.toDouble * c).sum / dd
      val expect = (ex2 - mean * mean) / mean
      assert(math.abs(vmr - expect) < 1e-6, s"$term vmr")
    }
    assert(got.length == 15)
    // ranked by total count descending
    assert(got.map(_._2._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("t32 conditional entropy matches a local bigram fold and bounds") {
    val got = graft.queries.Extended102.queries("t32_entropy_rate")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val docs = graft.Tables.t(spark, d, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).filter(_._2.length >= 2)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val bigrams = rows.flatMap(_._2.sliding(2).filter(_.length == 2))
      val cBg = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cX = bigrams.map(_.substring(0, 1)).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val n = bigrams.length.toLong
      val h = cBg.toSeq.sortBy(_._1).map { case (bg, c) =>
        -(c.toDouble / n) * math.log(c.toDouble / cX(bg.substring(0, 1)))
      }.sum
      assert(got(src)._1 == n, s"$src n_pairs")
      assert(got(src)._2 == cBg.size.toLong, s"$src n_bigrams")
      assert(math.abs(got(src)._3 - h) < 1e-5, s"$src h_cond")
      // conditioning can only reduce entropy: 0 <= H(Y|X) <= log(alphabet)
      assert(got(src)._3 >= 0.0)
      assert(got(src)._4 == BigDecimal(got(src)._3 / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble ||
        math.abs(got(src)._4 - got(src)._3 / math.log(2.0)) < 1e-5)
    }
    assert(got.nonEmpty)
  }
}
