package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-112: held-out bigram surprisal and LPA modularity, pinned to
  * local replays.
  */
class Extended112Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("t33 surprisal matches a local add-1 bigram LM") {
    val got = graft.queries.Extended112
      .queries("t34_bigram_surprisal")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toList

    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def inA(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      hex.charAt(0) < '8'
    }
    def bigrams(text: String): Seq[(String, String)] = {
      val ws = text.split(" ", -1).toSeq
      if (ws.length < 2) Seq.empty else ws.zip(ws.tail)
    }
    val train = docs.filter(t => inA(t._1)).flatMap(t => bigrams(t._2)).toSeq
    val eval_ = docs.filter(t => !inA(t._1)).flatMap(t => bigrams(t._2)).toSeq
    val c12 = train.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = train.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = train.map(_._2).distinct.size.toLong
    val top = eval_.groupBy(identity).toSeq
      .map { case (k, vs) => (k._1, k._2, vs.size.toLong) }
      .sortBy { case (w1, w2, n) => (-n, w1, w2) }.take(20)
    assert(got.map(t => (t._1, t._2, t._3)) ==
      top.map(t => (t._1, t._2, t._3)).toList)
    got.foreach { case (w1, w2, _, cTrain, surp) =>
      assert(cTrain == c12.getOrElse((w1, w2), 0L), s"c_train $w1 $w2")
      val p = (c12.getOrElse((w1, w2), 0L) + 1).toDouble /
        (c1.getOrElse(w1, 0L) + v).toDouble
      assert(math.abs(surp - (-math.log(p))) < 1e-5, s"surprisal $w1 $w2")
      assert(surp > 0.0)
    }
  }

  test("r15 per-community contributions match a local modularity walk") {
    val rows = graft.queries.Extended112.queries("r15_modularity")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

    // rebuild the r7 topology + 3 deterministic LPA rounds locally
    val sup = Tables.t(spark, d, "supplier")
      .select(col("s_suppkey")).collect().map(_.getLong(0)).sorted
    val supSet = sup.toSet
    val clique = sup.filter(_ <= 7)
    val e0 = (for { a <- clique; b <- clique if a < b } yield (a, b)) ++
      sup.filter(k => k >= 7 && supSet.contains(k + 1)).map(k => (k, k + 1))
    val adj = (e0 ++ e0.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var labels: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (node, nbrs) =>
        val votes = nbrs.toSeq.map(labels).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        node -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = e0.length.toLong
    val deg = (e0.map(_._1) ++ e0.map(_._2)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val byLabel = labels.groupBy(_._2)
    val want = byLabel.map { case (label, members) =>
      val nodes = members.keySet
      val eIn = e0.count(e => nodes.contains(e._1) && nodes.contains(e._2))
      val dSum = nodes.toSeq.map(deg).sum
      val q = (4.0 * m * eIn - dSum.toDouble * dSum) / (4.0 * m * m)
      (label, nodes.size.toLong, eIn.toLong, dSum, q)
    }.toSeq.sortBy(_._1)
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"community ${g._1} shape")
      assert(math.abs(g._5 - w._5) < 1e-6, s"community ${g._1} q")
    }
    // conservation invariants: every node in exactly one community, every
    // degree charged once, internal edges never exceed m; Q bounded
    // (at this sf the connected toy graph may collapse to ONE community
    // after 3 rounds — then Q = 1 − 1 = 0 exactly, which is correct)
    assert(rows.map(_._2).sum == adj.size.toLong, "node conservation")
    assert(rows.map(_._4).sum == 2 * m, "degree conservation")
    assert(rows.map(_._3).sum <= m, "internal edges bounded by m")
    val total = rows.map(_._5).sum
    assert(total >= -0.5 && total < 1.0)
    assert(rows.exists(_._2 >= 8))
  }
}
