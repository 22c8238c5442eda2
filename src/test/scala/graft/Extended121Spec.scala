package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-121: densest subgraph by parallel peeling, pinned to a local
  * replay of the identical rounds.
  */
class Extended121Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("j31 best round matches a local peeling walk and beats the whole graph") {
    val row = graft.queries.Extended121
      .queries("j31_densest_subgraph")(spark, d).collect().head
    val (bestRound, nNodes, nEdges, density) =
      (row.getInt(0), row.getLong(1), row.getLong(2), row.getDouble(3))

    val li = Tables.t(spark, d, "lineitem")
      .filter(col("l_linenumber") <= 5)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    var edges: Set[(Long, Long)] = byOrder.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for { a <- ps; b <- ps if a < b } yield (a, b)
    }.toSet
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 0
    while (r < 16 && edges.nonEmpty) {
      val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
        .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
      val n = deg.size.toLong
      val m = edges.size.toLong
      trace += ((r, n, m))
      val survive = deg.filter { case (_, c) => c * n > 2 * m }.keySet
      edges = edges.filter(e => survive(e._1) && survive(e._2))
      r += 1
    }
    val want = trace.maxBy { case (rr, n, m) => (m.toDouble / n, -rr) }
    assert(bestRound == want._1, s"round $bestRound vs ${want._1}")
    assert(nNodes == want._2 && nEdges == want._3)
    assert(math.abs(density - want._3.toDouble / want._2) < 1e-6)
    // peeling must find something at least as dense as the full graph
    val (r0n, r0m) = (trace.head._2, trace.head._3)
    assert(density >= r0m.toDouble / r0n - 1e-9,
      "best density must not be worse than round 0")
    assert(nNodes > 0 && nEdges > 0)
  }

  test("j31 degenerate input: empty lineitem yields zero rows (matches " +
      "the oracle's WHERE n > 0), not a NoSuchElementException") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-j31-empty")
    try {
      Tables.t(spark, d, "lineitem").limit(0)
        .write.parquet(s"$tmp/lineitem.parquet")
      val out = graft.queries.Extended121
        .queries("j31_densest_subgraph")(spark, tmp.toString)
      assert(out.columns.toSeq ==
        Seq("best_round", "n_nodes", "n_edges", "density"))
      assert(out.count() == 0L)
    } finally {
      graft.store.GraphPackage.walkTree(tmp)(
        _.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_)))
    }
  }
}
