package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-110: retrieval evaluation — RRF fusion and NDCG@10/MRR,
  * pinned to local brute-force replays.
  */
class Extended110Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def vecs = Tables.t(spark, d, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("v15 fused ranking equals the local two-retriever RRF walk") {
    val got = graft.queries.Extended110.queries("v15_rrf_fusion")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toList
    val vs = vecs
    val q = vs.find(_._1 == 0L).get
    val rest = vs.filter(_._1 != 0L)
    val cosRank = rest.map { case (id, v, _) => (id, cos(v, q._2)) }
      .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    def code(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0) lo |= 1L << i
      for (i <- 0 until 32) if (v(32 + i) > 0) hi |= 1L << i
      (lo, hi)
    }
    val (qlo, qhi) = code(q._2)
    val hamRank = rest.map { case (id, v, _) =>
        val (lo, hi) = code(v)
        (id, java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi))
      }.sortBy(t => (t._2, t._1)).take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val fused = (cosRank.keySet ++ hamRank.keySet).toSeq.map { id =>
      val rrf = cosRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        hamRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, cosRank.getOrElse(id, 0), hamRank.getOrElse(id, 0), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
    assert(got.map(_._1) == fused.map(_._1).toList, "fused id order")
    got.zip(fused).foreach { case (g, w) =>
      assert(g._2 == w._2 && g._3 == w._3, s"ranks for ${g._1}")
      assert(math.abs(g._4 - w._4) < 1e-6, s"rrf for ${g._1}")
    }
    // fusion is doing real work: at least one top-10 doc is missing from
    // one of the two lists (rank 0), or the two orderings genuinely mix
    assert(got.exists(r => r._2 != r._3))
  }

  test("v16 NDCG/MRR match a local brute-force evaluation") {
    val got = graft.queries.Extended110.queries("v16_ndcg_mrr")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val vs = vecs
    val queries = vs.filter(_._1 < 5)
    val cand = vs.filter(_._1 >= 5)
    def w(r: Int): Double = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    queries.foreach { case (qid, qv, qlabel) =>
      val top = cand.map { case (id, v, l) => (id, cos(v, qv), l) }
        .sortBy { case (id, c, _) => (-c, id) }.take(10)
      val dcg = top.zipWithIndex.map { case ((_, _, l), i) =>
        (if (l == qlabel) 1.0 else 0.0) * w(i + 1) }.sum
      val nRel = cand.count(_._3 == qlabel)
      val idcg = (1 to math.min(nRel, 10)).map(w).sum
      val firstRel = top.zipWithIndex.collectFirst {
        case ((_, _, l), i) if l == qlabel => i + 1 }
      val mrr = firstRel.map(r => 1.0 / r).getOrElse(0.0)
      val g = got(qid)
      assert(g._1 == nRel.toLong, s"q$qid n_rel")
      assert(math.abs(g._2 - dcg) < 1e-5, s"q$qid dcg")
      assert(math.abs(g._3 - idcg) < 1e-5, s"q$qid idcg")
      assert(math.abs(g._4 - dcg / idcg) < 1e-5, s"q$qid ndcg")
      assert(math.abs(g._5 - mrr) < 1e-6, s"q$qid mrr")
      assert(g._4 >= 0.0 && g._4 <= 1.0 + 1e-9, s"q$qid ndcg in [0,1]")
    }
    assert(got.size == 5)
  }
}
