package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-117: TextRank keywords, pinned to a local graph walk. */
class Extended117Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("t35 scores match a local three-iteration weighted TextRank") {
    val got = graft.queries.Extended117
      .queries("t35_textrank_keywords")(spark, d)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toList

    val docs = Tables.t(spark, d, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val tokens = docs.map(_.split(" ", -1).toSeq.filter(_.nonEmpty))
    val freq = tokens.flatten.groupBy(identity)
      .map { case (w, v) => w -> v.size }
    val cand = freq.toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
      .map(_._1).toSet
    val adj = tokens.flatMap(ws => ws.zip(ws.tail))
      .filter { case (a, b) => a != b && cand(a) && cand(b) }
    val und = adj.map { case (a, b) => (Seq(a, b).min, Seq(a, b).max) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sym = und.toSeq.flatMap { case ((a, b), wt) =>
      Seq((a, b, wt), (b, a, wt)) }
    val strength = sym.groupBy(_._2).map { case (j, es) =>
      j -> es.map(_._3).sum }
    val nodes = sym.map(_._1).distinct
    val inEdges = sym.groupBy(_._1) // i -> incoming (j, wt)
    var s: Map[String, Double] = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      s = nodes.map { i =>
        val contrib = inEdges(i).sortBy(_._2).map { case (_, j, wt) =>
          wt.toDouble / strength(j).toDouble * s(j) }.sum
        i -> (0.15 + 0.85 * contrib)
      }.toMap
    }
    val want = s.toSeq.sortBy { case (w, sc) => (-sc, w) }.take(20)
    assert(got.map(_._1) == want.map(_._1).toList, "keyword order")
    got.zip(want).foreach { case ((w, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-5, s"score for $w")
    }
    // keywords are real: every one is a candidate and scores exceed the
    // damping floor
    assert(got.forall(g => cand(g._1)))
    assert(got.head._2 > 0.15)
  }
}
