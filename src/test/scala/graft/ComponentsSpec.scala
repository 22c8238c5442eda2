package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.route.Components

/** The SCC gate's two paths must agree label-for-label: both name a
  * component by its smallest member id.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // two 3-cycles, a 2-cycle, a chain of singletons feeding a cycle
  private val nodes = (1L to 12L).toArray
  private val edges = Array[(Long, Long)](
    (1L, 2L), (2L, 3L), (3L, 1L),          // scc {1,2,3}
    (4L, 5L), (5L, 6L), (6L, 4L),          // scc {4,5,6}
    (7L, 8L), (8L, 7L),                    // scc {7,8}
    (9L, 10L), (10L, 11L), (11L, 12L),     // singleton chain
    (3L, 4L), (6L, 7L), (8L, 9L))          // DAG edges between sccs

  test("local Tarjan labels components by min member id") {
    val got = Components.sccLocal(nodes, edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L,
      7L -> 7L, 8L -> 7L,
      9L -> 9L, 10L -> 10L, 11L -> 11L, 12L -> 12L))
  }

  test("gated scc equals GraphX scc label-for-label") {
    import spark.implicits._
    val nodesDf = nodes.toSeq.toDF("u")
    val edgesDf = edges.toSeq.toDF("u", "v")
    def labels(maxLocal: Long) =
      Components.scc(spark, nodesDf, edgesDf, maxLocalEdges = maxLocal)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = labels(Long.MaxValue)
    val graphx = labels(-1)
    assert(local == graphx, s"local $local vs graphx $graphx")
  }

  test("local Tarjan survives a deep path without recursion") {
    // a 50k-node simple path would blow a recursive Tarjan's JVM stack;
    // the explicit-stack version must label every node a singleton
    val n = 50000
    val ns = (0L until n.toLong).toArray
    val es = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toArray
    val got = Components.sccLocal(ns, es)
    assert(got.size == n && got.forall { case (k, v) => k == v })
  }

  test("edges referencing unknown nodes are rejected on the local path") {
    intercept[IllegalArgumentException] {
      Components.sccLocal(Array(1L, 2L), Array((1L, 3L)))
    }
  }
}
