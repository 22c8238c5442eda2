package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Hits

/** Batch-63 operators: Heaps'-law vocabulary growth and integer HITS. */
class Extended63Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  /** Local unnormalized HITS model over an edge list. */
  private def localHits(edges: Seq[(String, String)], iters: Int)
      : (Map[String, Long], Map[String, Long]) = {
    var hub: Map[String, Long] =
      edges.map(_._1).distinct.map(_ -> 1L).toMap
    var auth: Map[String, Long] = Map.empty
    for (_ <- 1 to iters) {
      auth = edges.groupBy(_._2).view.mapValues(
        _.map(e => hub.getOrElse(e._1, 0L)).sum).toMap
      hub = edges.groupBy(_._1).view.mapValues(
        _.map(e => auth(e._2)).sum).toMap
    }
    (hub, auth)
  }

  test("Hits equals the local model on seeded random directed graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(631)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(20)
      val edges = (0 until 4 * n).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.distinct.filter(e => e._1 != e._2)
      val iters = 1 + rnd.nextInt(3)
      val got = Hits.hits(spark, edges.toDF("src", "dst"), iters)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toList.sortBy(_._1)
      val (h, a) = localHits(edges, iters)
      val want = (h.keySet ++ a.keySet).toList.sorted.map { nd =>
        (nd, h.getOrElse(nd, 0L), a.getOrElse(nd, 0L))
      }
      assert(got == want, s"trial=$trial iters=$iters")
    }
  }

  test("r12 top-20 authorities match a local replay of two rounds") {
    val got = graft.queries.Extended63.queries("r12_hits")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val edges = Tables.t(spark, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (s"${r.getLong(0) * 2}", s"${r.getLong(1) * 2 + 1}"))
      .toSeq
    val (_, a) = localHits(edges, 2)
    val want = a.toList.collect { case (k, v) if k.toLong % 2 == 1 =>
      ((k.toLong - 1) / 2, v)
    }.sortBy(t => (-t._2, t._1)).take(20)
    assert(got == want)
  }

  test("t23 cumulative curves equal per-prefix distinct counts") {
    val got = graft.queries.Extended63.queries("t23_vocab_growth")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got.nonEmpty)
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
      .sortBy(_._1)
    for ((ck, cumTok, vocab) <- got) {
      val prefix = docs.filter(_._1 <= ck)
      assert(cumTok == prefix.map(_._2.size.toLong).sum, s"tokens@$ck")
      assert(vocab == prefix.flatMap(_._2).distinct.size.toLong, s"vocab@$ck")
    }
    // the curve is monotone and vocabulary grows sublinearly vs tokens
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.map(_._3) == got.map(_._3).sorted)
  }
}
